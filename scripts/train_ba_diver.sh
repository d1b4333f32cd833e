#!/bin/bash
# End-to-end BA diver pipeline, entirely in-framework (no reference data):
# generate a labeled BA training set mirroring the GEN21_test2 parameter
# grid (sizes 100-300 x avg-neighbors 2-20), train the 32-head
# GCN_DEEP_DIVER with the hindsight-min CE, then sweep the BA test set
# with the best-solution-first tree search (DGCN-RS).
set -e

python -m distgcn_tpu.cli.gen_data --datapath=./data/BA_Graph_Uniform_mixN_mixp_train0 \
    --type=BA --sizes=100,150,200,250,300 --nbs=2,5,10,15,20 --n=100 \
    --dist=uniform --seed=11
python -m distgcn_tpu.cli.gen_data --datapath=./data/BA_Graph_Uniform_mixN_mixp_val0 \
    --type=BA --sizes=100,150,200,250,300 --nbs=2,5,10,15,20 --n=2 \
    --dist=uniform --seed=12

python -m distgcn_tpu.cli.train_diver \
    --datapath=./data/BA_Graph_Uniform_mixN_mixp_train0 \
    --test_datapath=./data/BA_Graph_Uniform_mixN_mixp_val0 \
    --training_set=BAUNI --num_layer=20 --hidden1=32 --diver_num=32 \
    --feature_size=32 --max_degree=1 --predict=mwis \
    --learning_rate=1e-4 --epochs=4 --pad_to=384

python -m distgcn_tpu.cli.eval_graphs \
    --datapath=data/BA_Graph_Uniform_GEN21_test2 \
    --training_set=BAUNI --feature_size=32 --hidden1=32 --num_layer=20 \
    --max_degree=1 --diver_num=32 --predict=mwis \
    --rollout=1 --max_pops=8 --diver_out=16 --backoff_prob=0.5

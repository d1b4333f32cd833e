#!/bin/bash
# Staged-epsilon DQN training for 2/4/3-layer models (reference
# bash/train_gcn_dqn_ep.sh): epsilon 1 -> 0.2 -> 0.1 -> 0.05 with annealed
# learning rate per stage.
set -e
common="--epsilon_min=0.002 --feature_size=1 --diver_num=1 \
  --datapath=./data/ER_Graph_Uniform_mixN_mixp_train1 \
  --test_datapath=./data/ER_Graph_Uniform_GEN21_test1 \
  --max_degree=1 --predict=mwis --hidden1=32"
for layers in 2 4 3; do
  python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=${layers} \
    --epsilon=1    --learning_rate=0.00001    --epochs=5
  python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=${layers} \
    --epsilon=0.2  --learning_rate=0.00001    --epochs=5
  python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=${layers} \
    --epsilon=0.1  --learning_rate=0.000001   --epochs=5
  python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=${layers} \
    --epsilon=0.05 --learning_rate=0.0000001  --epochs=10
done

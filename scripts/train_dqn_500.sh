#!/bin/bash
# 20/3/1-layer DQN training on the ER mixN_mixp training set (reference
# bash/train_dqn_500.sh), IS4SAT naming.
set -e
common="--training_set=IS4SAT --epsilon=1 --epsilon_min=0.002 \
  --feature_size=1 --diver_num=1 \
  --datapath=./data/ER_Graph_Uniform_mixN_mixp_train0 \
  --test_datapath=./data/ER_Graph_Uniform_GEN21_test1 \
  --max_degree=1 --predict=mwis --learning_rate=0.00001 --hidden1=32"
python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=20 --epochs=25
python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=3 --epochs=25
python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=1 --epochs=25

#!/bin/bash
# Single-channel wireless flood test of the 1-layer DQN scheduler at qrm
# weights (reference bash/test_dqn_500.sh live line).
set -e
python3 -m distgcn_tpu.cli.wireless_sim --wt_sel=qrm --epsilon=1 \
  --epsilon_min=0.0002 --feature_size=1 --diver_num=1 \
  --test_datapath=./data/wireless_test --max_degree=1 --predict=mwis \
  --learning_rate=0.00001 --hidden1=32 --num_layer=1 --num_channels=1 \
  --opt=0 --flood=1 --instances=10

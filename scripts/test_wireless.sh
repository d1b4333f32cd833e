#!/bin/bash
# Single-channel wireless flood sweeps for the 1-layer and 20-layer IS4SAT
# schedulers at qrm weights (reference bash/test_wireless.sh).
set -e
mkdir -p wireless
common="--training_set=IS4SAT --wt_sel=qrm --epsilon=1 --epsilon_min=0.0002 \
  --feature_size=1 --diver_num=1 --max_degree=1 --predict=mwis \
  --test_datapath=./data/wireless_test --num_channels=1 --opt=0 --flood=1"
python3 -m distgcn_tpu.cli.wireless_sim $common --num_layer=1
python3 -m distgcn_tpu.cli.wireless_sim $common --num_layer=20

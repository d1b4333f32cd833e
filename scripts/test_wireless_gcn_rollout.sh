#!/bin/bash
# Rollout-search (DGCN-RS, opt=2) wireless sweeps (reference
# bash/test_wireless_gcn_rollout.sh): flood at 0.85, 3-channel, and
# single-channel low-load ranges.
set -e
mkdir -p wireless/crsv
common="--wt_sel=qr --feature_size=1 --epsilon_min=0.005 --diver_num=1 \
  --test_datapath=./data/wireless_test --max_degree=1 --predict=mwis \
  --hidden1=32 --num_layer=1 --training_set=IS4SAT --opt=2 \
  --output=./wireless/crsv"
python3 -m distgcn_tpu.cli.wireless_sim $common --wt_sel=qrm \
  --load_min=0.85 --load_max=0.86 --load_step=0.02 --instances=10 --flood=1
python3 -m distgcn_tpu.cli.wireless_sim $common --num_channels=3 \
  --load_min=0.1 --load_max=1.2 --load_step=0.1 --instances=2
python3 -m distgcn_tpu.cli.wireless_sim $common \
  --load_min=0.01 --load_max=0.3 --load_step=0.02 --instances=2

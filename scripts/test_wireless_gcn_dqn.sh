#!/bin/bash
# Single-channel wireless scheduling eval (reference
# bash/test_wireless_gcn_dqn.sh): Greedy vs DGCN-LGS vs Benchmark (opt=0).
set -e
python3 -m distgcn_tpu.cli.wireless_sim --wt_sel=qr --num_channels=1 \
  --load_min=0.1 --load_max=1.0 --load_step=0.1 --feature_size=1 \
  --diver_num=1 --test_datapath=./data/wireless_test --max_degree=1 \
  --predict=mwis --hidden1=32 --num_layer=1 --opt=0 --output=./wireless/

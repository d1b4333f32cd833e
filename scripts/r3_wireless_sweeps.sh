#!/bin/bash
# Round-3 reference-scale wireless sweep grid (VERDICT r2 next #5):
# 20 networks x loads 0.1:0.1:1.0, opts 0-3 single-channel and the
# 3-channel 5/6/7 set — the reference drivers' sweep dimensions
# (wireless_dqn_test.py:146,166-178). Resumable; safe to re-run.
set -u
cd "$(dirname "$0")/.."
common="--wt_sel=qr --load_min=0.1 --load_max=1.0 --load_step=0.1 \
  --feature_size=1 --diver_num=1 --test_datapath=./data/wireless_test \
  --max_degree=1 --predict=mwis --hidden1=32 --num_layer=1 \
  --training_set=IS4SAT --output=./output/wireless \
  --model_root=/root/reference/model"
for opt in 0 1 2 3; do
  timeout 14000 python -m distgcn_tpu.cli.wireless_sim $common \
    --num_channels=1 --opt=$opt \
    > output/logs/r3_wireless_1ch_opt${opt}.log 2>&1
done
for opt in 5 6 7; do
  timeout 14000 python -m distgcn_tpu.cli.wireless_sim $common \
    --num_channels=3 --opt=$opt \
    > output/logs/r3_wireless_3ch_opt${opt}.log 2>&1
done
echo ALL_SWEEPS_DONE

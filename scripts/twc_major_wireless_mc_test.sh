#!/bin/bash
# 3-channel wireless sweep, opts 5/6/7 (reference
# bash/twc_major_wireless_mc_test.sh): DGCN-LGS-Seq / CGCN-RS-Seq / LGS-Seq.
set -e
for opt in 5 6 7; do
  python3 -m distgcn_tpu.cli.wireless_sim --wt_sel=qr --num_channels=3 \
    --load_min=0.1 --load_max=1.2 --load_step=0.1 --feature_size=1 \
    --epsilon_min=0.005 --diver_num=1 --test_datapath=./data/wireless_test \
    --max_degree=1 --predict=mwis --hidden1=32 --num_layer=1 --instances=2 \
    --training_set=IS4SAT --opt=${opt} --output=./wireless/
done

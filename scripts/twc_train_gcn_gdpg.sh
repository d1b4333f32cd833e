#!/bin/bash
# GDPG training grid (reference bash/twc_train_gcn_gdpg.sh):
# layers in {20, 2, 3, 1}, feature_size=1, hidden1=32, diver_num=1,
# lr=1e-5, 25 epochs, on ER mixN_mixp_train0 with GEN21_test1 validation.
set -e
setval="ERGDPG"
graph='ER'; dist='Uniform'
train_data="${graph}_Graph_${dist}_mixN_mixp_train0"
test_data="${graph}_Graph_${dist}_GEN21_test1"
for layers in 20 2 3 1; do
  python3 -m distgcn_tpu.cli.train_gdpg --training_set=${setval} \
    --epsilon=1 --epsilon_min=0.002 --feature_size=1 --diver_num=1 \
    --datapath=./data/${train_data} --test_datapath=./data/${test_data} \
    --max_degree=1 --predict=mwis --learning_rate=0.00001 --hidden1=32 \
    --num_layer=${layers} --epochs=25
done

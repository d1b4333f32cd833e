#!/bin/bash
# Eval grid on the 500-graph GEN21_test2 sets (reference
# bash/twc_test_gdpg_500graphs.sh): ER + BA, layers in {20, 3, 2, 1}.
set -e
setval="ERGDPG"; dist='Uniform'
for graph in 'ER' 'BA'; do
  test_data="${graph}_Graph_${dist}_GEN21_test2"
  for layers in 20 3 2 1; do
    python3 -m distgcn_tpu.cli.eval_graphs --training_set=${setval} \
      --epsilon=.0002 --feature_size=1 --diver_num=1 \
      --datapath=./data/${test_data} --max_degree=1 --predict=mwis \
      --learning_rate=0.00001 --hidden1=32 --num_layer=${layers}
  done
done

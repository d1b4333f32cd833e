#!/bin/bash
# Evaluation half of the generalization grid (reference
# bash/generalization_dqn_test.sh): pre-trained IS4SAT / DQNBA models at
# layers {1,3,20} on the ER and BA GEN21_test2 sets.
set -e
for layers in 1 3 20; do
  for setval in IS4SAT DQNBA; do
    for testset in ER_Graph_Uniform_GEN21_test2 BA_Graph_Uniform_GEN21_test2; do
      python3 -m distgcn_tpu.cli.eval_graphs --training_set=${setval} \
        --epsilon=.0002 --feature_size=1 --diver_num=1 \
        --datapath=./data/${testset} --max_degree=1 --predict=mwis \
        --hidden1=32 --num_layer=${layers}
    done
  done
done

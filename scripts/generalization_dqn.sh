#!/bin/bash
# Cross-distribution generalization grid (reference bash/generalization_dqn.sh):
# train DGCN{ER,BA} at layers {1,3,20} on mixN_mixp_train0, then evaluate each
# model on the ER and BA GEN21_test2 sets.
set -e
dist='Uniform'
folder='dqngen'; mkdir -p ${folder}

for graph in ER BA; do
  setval="DGCN${graph}"
  train_data="${graph}_Graph_${dist}_mixN_mixp_train0"
  test_data="${graph}_Graph_${dist}_GEN21_test1"
  for layers in 1 3 20; do
    python3 -m distgcn_tpu.cli.train_dqn --training_set=${setval} \
      --epsilon=1 --epsilon_min=0.002 --feature_size=1 --diver_num=1 \
      --datapath=./data/${train_data} --test_datapath=./data/${test_data} \
      --max_degree=1 --predict=mwis --learning_rate=0.00001 --hidden1=32 \
      --num_layer=${layers} --epochs=25
  done
done

for graph in ER BA; do
  setval="DGCN${graph}"
  for layers in 1 3 20; do
    for testset in ER_Graph_Uniform_GEN21_test2 BA_Graph_Uniform_GEN21_test2; do
      python3 -m distgcn_tpu.cli.eval_graphs --training_set=${setval} \
        --epsilon=.0002 --feature_size=1 --diver_num=1 \
        --datapath=./data/${testset} --max_degree=1 --predict=mwis \
        --hidden1=32 --num_layer=${layers}
    done
  done
done

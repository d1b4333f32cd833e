#!/bin/bash
# BA-trained DQN family (reference bash/train_dqn_501.sh): generate the BA
# training set if absent, then train 20/2/3/1-layer models, DQNBA naming.
set -e
graph='BA'; dist='Uniform'; setval='DQNBA'
train_data="${graph}_Graph_${dist}_mixN_mixp_train0"
if [ ! -d "./data/${train_data}" ]; then
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${train_data} \
    --n 200 --sizes "50,100,150,200,250" --ps "0.02,0.05,0.075,0.10,0.15" \
    --type "${graph}"
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${train_data} \
    --n 20 --sizes "50,100,150,200,250" \
    --ps "0.90,0.80,0.70,0.60,0.50,0.40,0.30" --type "${graph}" \
    --dist normal_l2
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${train_data} \
    --n 30 --sizes "20" --nbs "18,16,14,12,10,8,6,4,2" --type "${graph}" \
    --dist normal_l2
fi
test_data="${graph}_Graph_${dist}_GEN21_test1"
common="--training_set=${setval} --epsilon=1 --epsilon_min=0.002 \
  --feature_size=1 --diver_num=1 --datapath=./data/${train_data} \
  --test_datapath=./data/${test_data} --max_degree=1 --predict=mwis \
  --learning_rate=0.00001 --hidden1=32"
for layers in 20 2 3 1; do
  python3 -m distgcn_tpu.cli.train_dqn $common --num_layer=${layers} --epochs=25
done

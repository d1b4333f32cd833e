#!/bin/bash
# Regression-net dataset prep + eval recipe (reference bash/test_regression.sh):
# generates BA GEN21_test2/test3 sets if absent, then evaluates the 20-layer
# model on them.
set -e
graph='BA'; dist='Uniform'
testfolder="${graph}_Graph_${dist}_GEN21_test2"
if [ ! -d "./data/${testfolder}" ]; then
  for size in 100 150 200 250 300; do
    python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${testfolder} \
      --n 20 --sizes "${size}" --nbs "2,5,10,15,20" --type "${graph}" \
      --dist "${dist}"
  done
fi
testfolder3="${graph}_Graph_${dist}_GEN21_test3"
if [ ! -d "./data/${testfolder3}" ]; then
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${testfolder3} --n 20 \
    --sizes "100" --nbs "2,5,10,15,20" --type "${graph}" --dist "${dist}"
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${testfolder3} --n 20 \
    --sizes "150" --nbs "3,7.5,15,22.5,30" --type "${graph}" --dist "${dist}"
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${testfolder3} --n 20 \
    --sizes "200" --nbs "4,10,20,30,40" --type "${graph}" --dist "${dist}"
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${testfolder3} --n 20 \
    --sizes "250" --nbs "5,12.5,25,37.5,50" --type "${graph}" --dist "${dist}"
  python3 -m distgcn_tpu.cli.gen_data --datapath ./data/${testfolder3} --n 20 \
    --sizes "300" --nbs "6,15,30,45,60" --type "${graph}" --dist "${dist}"
fi
for testset in ${testfolder} ${testfolder3}; do
  python3 -m distgcn_tpu.cli.eval_graphs --training_set=ERGREG \
    --feature_size=1 --diver_num=1 --datapath=./data/${testset} \
    --max_degree=1 --predict=mwis --hidden1=32 --num_layer=20
done

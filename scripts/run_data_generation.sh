#!/bin/bash
# Dataset recipe (reference bash/run_data_generation.sh): mixN/mixp training
# sets + GEN21 test sets for ER and BA.
set -e
dist='uniform'
for graph in 'ER' 'BA'; do
  train_data="${graph}_Graph_Uniform_mixN_mixp_train0"
  if [ ! -d "./data/${train_data}" ]; then
    python3 -m distgcn_tpu.cli.gen_data --datapath=./data/${train_data} \
      --n=200 --sizes="50,100,150,200,250" --ps="0.02,0.05,0.075,0.10,0.15" \
      --type=${graph} --dist=${dist}
    python3 -m distgcn_tpu.cli.gen_data --datapath=./data/${train_data} \
      --n=20 --sizes="50,100,150,200,250" \
      --ps="0.90,0.80,0.70,0.60,0.50,0.40,0.30" --type=${graph} --dist=normal_l2
    python3 -m distgcn_tpu.cli.gen_data --datapath=./data/${train_data} \
      --n=30 --sizes="20" --nbs="18,16,14,12,10,8,6,4,2" --type=${graph} \
      --dist=normal_l2
  fi
  for tf in GEN21_test2 GEN21_test1; do
    testfolder="${graph}_Graph_Uniform_${tf}"
    n=20; [ "$tf" = "GEN21_test1" ] && n=2
    if [ ! -d "./data/${testfolder}" ]; then
      for size in 100 150 200 250 300; do
        python3 -m distgcn_tpu.cli.gen_data --datapath=./data/${testfolder} \
          --n=${n} --sizes="${size}" --nbs="2,5,10,15,20" --type=${graph} \
          --dist=${dist}
      done
    fi
  done
done

#!/bin/bash
# Optimal-solver benchmark sweep (reference bash via mwis_mlp_test.py):
# exact MWIS (native B&B) over the GEN21_test2 sets, escalating timeout.
set -e
for graph in 'ER' 'BA'; do
  python3 -m distgcn_tpu.cli.benchmark_solver \
    --datapath=./data/${graph}_Graph_Uniform_GEN21_test2 --solver=optimal \
    --timeout=30
done

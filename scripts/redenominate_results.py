#!/usr/bin/env python3
"""Recompute the RESULTS.md 'ratios re-denominated on OUR proven optima'
table from the current exact-sweep CSVs (resumable sweeps move the proven
set; this keeps the table honest without hand-editing numbers).

For each model sweep CSV (per-instance p = model_util / greedy_util) and
each graph family, reports over the rows whose instance our exact solver
has PROVEN (status == Optimal in output/mwis_exact_<fam>_...csv):
  - proven count / 500
  - mean model/greedy over the proven subset AND over the full set
  - mean model/optimal over the proven subset, using p_model / p_opt
    (both ratios share the greedy denominator, so the division is exact).

Usage: python scripts/redenominate_results.py
"""
import os
import sys

import numpy as np
import pandas as pd

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODELS = [
    ("GCN-LGS l1 (imported)", "ER",
     "result_IS4SAT_deep_ld1_c32_l1_cheb1_diver1_mwis_dqn_ER.csv"),
    ("GCN-LGS l20 (imported)", "ER",
     "result_IS4SAT_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn_ER.csv"),
    ("GCN-LGS l20 (in-framework)", "ER",
     "result_ERGDPG2_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn_"
     "ER_Graph_Uniform_GEN21_test2.csv"),
    ("diver32 rollout rs32", "ER",
     "result_ERUNI_deep_ld32_c32_l20_cheb1_diver32_mwis_diver_rs32_"
     "ER_Graph_Uniform_GEN21_test2.csv"),
    ("GCN-LGS l1 (imported)", "BA",
     "result_IS4SAT_deep_ld1_c32_l1_cheb1_diver1_mwis_dqn_BA.csv"),
    ("GCN-LGS l20 (imported)", "BA",
     "result_IS4SAT_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn_BA.csv"),
    ("diver32 rollout rs8", "BA",
     "result_ERUNI_deep_ld32_c32_l20_cheb1_diver32_mwis_diver_rs8_"
     "BA_Graph_Uniform_GEN21_test2.csv"),
]


def main():
    out = os.path.join(ROOT, "output")
    opt = {}
    for fam in ("ER", "BA"):
        df = pd.read_csv(os.path.join(
            out, f"mwis_exact_{fam}_Graph_Uniform_GEN21_test2.csv"),
            index_col=0)
        proven = df[df["status"] == "Optimal"].set_index("data")["p"]
        opt[fam] = proven
        print(f"{fam}: {len(proven)}/500 proven "
              f"(mean optimal/greedy over proven: {proven.mean():.5f})")
    print()
    print("| Model | set (proven rows) | vs greedy (proven) | vs greedy "
          "(full 500) | model/optimal (proven) |")
    print("|---|---|---|---|---|")
    for name, fam, csv in MODELS:
        path = os.path.join(out, csv)
        if not os.path.isfile(path):
            print(f"| {name} | {fam} MISSING {csv} | | | |")
            continue
        m = pd.read_csv(path, index_col=0).set_index("data")["p"]
        proven = opt[fam]
        common = m.index.intersection(proven.index)
        sub = m.loc[common] / proven.loc[common]
        print(f"| {name} | {fam} ({len(proven)}/500) | "
              f"{m.loc[common].mean():.5f} | {m.mean():.5f} | "
              f"{sub.mean():.5f} |")


if __name__ == "__main__":
    sys.exit(main())

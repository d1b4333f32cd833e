"""Optimal/benchmark solver driver — re-designs `mwis_mlp_test.py`.

Sweeps a dataset with the exact MWIS solver (native B&B, replacing Gurobi)
or the clique-LP message-passing rounding (`mp_greedy`), writing per-instance
``p`` = solver_util / greedy_util, runtime and status to a resumable CSV.

Resume semantics parity (mwis_mlp_test.py:79-152): rows with p == 0 are
re-attempted on each sweep with the timeout escalated x10, until none remain
or --max_sweeps is hit.

Usage:
    python -m distgcn_tpu.cli.benchmark_solver --datapath=data/..._test2 \
        --solver=optimal --timeout=10
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from distgcn_tpu.data.matio import load_mat, list_dataset
from distgcn_tpu.solvers.exact import mwis_exact
from distgcn_tpu.solvers.greedy import greedy_search
from distgcn_tpu.utils.config import Config


def main(argv=None, max_sweeps: int = 3):
    cfg = Config.from_args(argv)
    import argparse
    extra = argparse.ArgumentParser()
    extra.add_argument("--output_dir", default="./output")
    ns, _ = extra.parse_known_args(argv)

    files = list_dataset(cfg.datapath)
    dataset = os.path.basename(os.path.normpath(cfg.datapath))
    solver_tag = {"optimal": "mwis_exact",
                  "milp": "mwis_milp"}.get(cfg.solver, "mp_clique_greedy")
    os.makedirs(ns.output_dir, exist_ok=True)
    out_csv = os.path.join(ns.output_dir, f"{solver_tag}_{dataset}.csv")

    if os.path.isfile(out_csv):
        df = pd.read_csv(out_csv, index_col=0)
    else:
        df = pd.DataFrame({"data": files, "p": np.zeros(len(files)),
                           "runtime": np.zeros(len(files)),
                           "status": [""] * len(files)})

    timeout = float(cfg.timeout)
    for sweep in range(max_sweeps):
        todo = df.index[df["p"] == 0].tolist()
        if not todo:
            break
        print(f"sweep {sweep}: {len(todo)} unsolved, timeout {timeout}s")
        for idx in todo:
            fname = df.loc[idx, "data"]
            inst = load_mat(os.path.join(cfg.datapath, fname))
            _, greedy_util = greedy_search(inst.adj, inst.weights)
            t0 = time.time()
            if cfg.solver == "optimal":
                _, util, status = mwis_exact(inst.adj, inst.weights, timeout)
            elif cfg.solver == "milp":
                from distgcn_tpu.solvers.exact import mwis_milp
                _, util, status = mwis_milp(inst.adj, inst.weights, timeout)
            else:
                from distgcn_tpu.solvers.relax import mp_greedy
                _, util = mp_greedy(inst.adj, inst.weights)
                status = "Rounded"
            runtime = time.time() - t0
            ratio = util / greedy_util if greedy_util else 1.0
            # only record as done when proven (or heuristic modes)
            df.loc[idx, "p"] = ratio if status != "Timeout" else 0.0
            df.loc[idx, "runtime"] = runtime
            df.loc[idx, "status"] = status
            df.to_csv(out_csv)
            print(f"{fname}: p={ratio:.6f} status={status} "
                  f"runtime={runtime:.2f}s")
        timeout *= 10  # escalate (mwis_mlp_test.py:152)
    solved = df[df["p"] > 0]
    if len(solved):
        print(f"mean p over {len(solved)} solved: {solved['p'].mean():.6f} "
              f"-> {out_csv}")
    return df


if __name__ == "__main__":
    main()

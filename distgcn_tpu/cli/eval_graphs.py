"""Graph-set evaluation driver — re-designs `mwis_dqn_test.py`.

Loads a trained model by the reference naming convention, sweeps a test
dataset, reports per-instance ratio vs the centralized greedy baseline, and
appends a CSV ``./output/{model_name}.csv`` with columns ["data", "p"]
(mwis_dqn_test.py:302-348).

TPU redesign: instances are evaluated in padded device batches (one XLA
launch per bucket) instead of one feed_dict per graph.

Usage:
    python -m distgcn_tpu.cli.eval_graphs --datapath=data/ER_..._test2 \
        --training_set=IS4SAT --num_layer=1 --hidden1=32 --feature_size=1 \
        --diver_num=1 --max_degree=1 --predict=mwis [--model_root=...]
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd

from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.pipeline import BatchedEvaluator
from distgcn_tpu.utils.config import Config
from distgcn_tpu.utils.directory import find_model_folder


def main(argv=None):
    cfg = Config.from_args(argv)
    import argparse
    extra = argparse.ArgumentParser()
    extra.add_argument("--model_root", default="./model")
    extra.add_argument("--output_dir", default="./output")
    ns, _ = extra.parse_known_args(argv)

    model_origin = find_model_folder(cfg, "dqn", ns.model_root)
    agent = DQNAgent(cfg, model_family="gcn_dqn")
    if not agent.load(model_origin):
        print(f"Unable to load {model_origin}")

    from distgcn_tpu.data.matio import load_dataset_cached
    insts = load_dataset_cached(cfg.datapath)

    ev = BatchedEvaluator(agent, batch_size=cfg.batch_size)
    t0 = time.time()
    utils, gutils = ev.evaluate([(i.adj, i.weights) for i in insts])
    runtime = time.time() - t0

    ratios = utils / np.maximum(gutils, 1e-9)
    rows = [{"data": inst.name, "p": ratios[i]}
            for i, inst in enumerate(insts)]
    results = pd.DataFrame(rows, columns=["data", "p"])
    os.makedirs(ns.output_dir, exist_ok=True)
    # reference writes ./output/{model}.csv (mwis_dqn_test.py:348); we add
    # the dataset name so sweeps over several test sets don't clobber
    ds = os.path.basename(os.path.normpath(cfg.datapath))
    out_csv = os.path.join(ns.output_dir,
                           model_origin.split("/")[-1] + f"_{ds}.csv")
    results.to_csv(out_csv)
    print(f"instances: {len(insts)}  mean ratio vs greedy: "
          f"{np.mean(ratios):.6f}  runtime: {runtime:.2f}s "
          f"({len(insts)/runtime:.1f} graphs/s)  -> {out_csv}")
    return float(np.mean(ratios))


if __name__ == "__main__":
    main()

"""Graph-set evaluation driver — re-designs `mwis_dqn_test.py`.

Loads a trained model by the reference naming convention, sweeps a test
dataset, reports per-instance ratio vs the centralized greedy baseline, and
appends a CSV ``./output/{model_name}.csv`` with columns ["data", "p"]
(mwis_dqn_test.py:302-348).

TPU redesign: instances are evaluated in padded device batches (one XLA
launch per bucket) instead of one feed_dict per graph.

Rollout mode (``--rollout=1``): the centralized tree-search sweep of
`mwis_dqn_test.py`'s rollout configuration — a GCN_DEEP_DIVER model drives
the best-solution-first queue (`DiverAgent.solve_mwis_bsf`,
mwis_dqn_test.py:59-135) per instance, with the reference's resumable-CSV
protocol (rows with p == 0 are re-attempted on the next run,
mwis_dqn_test.py:302-318).

Usage:
    python -m distgcn_tpu.cli.eval_graphs --datapath=data/ER_..._test2 \
        --training_set=IS4SAT --num_layer=1 --hidden1=32 --feature_size=1 \
        --diver_num=1 --max_degree=1 --predict=mwis [--model_root=...] \
        [--rollout=1 --max_pops=8]
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
    extra.add_argument("--rollout", type=int, default=0)
    extra.add_argument("--max_pops", type=int, default=8)
    extra.add_argument("--batch_pops", type=int, default=8,
                       help="bsf states evaluated per device launch pair")
    extra.add_argument("--group", type=int, default=4,
                       help="instances searched in lockstep, sharing "
                            "device launches (solve_mwis_bsf_many)")
    ns, _ = extra.parse_known_args(argv)

    if ns.rollout:
        return rollout_main(cfg, ns)

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


def rollout_main(cfg: Config, ns):
    """DGCN-RS tree-search sweep: one best-solution-first search per
    instance (device-batched diver-head evals per pop), resumable CSV."""
    from distgcn_tpu.agents_extra import DiverAgent
    from distgcn_tpu.data.matio import load_mat, list_dataset
    from distgcn_tpu.solvers.greedy import greedy_search

    model_origin = find_model_folder(cfg, "diver", ns.model_root)
    agent = DiverAgent(cfg)
    if not agent.load(model_origin):
        print(f"Unable to load {model_origin}")

    files = list_dataset(cfg.datapath)
    ds = os.path.basename(os.path.normpath(cfg.datapath))
    os.makedirs(ns.output_dir, exist_ok=True)
    out_csv = os.path.join(
        ns.output_dir,
        model_origin.split("/")[-1] + f"_rs{ns.max_pops}_{ds}.csv")
    if os.path.isfile(out_csv):
        df = pd.read_csv(out_csv, index_col=0)
        # reconcile with the current dataset listing: files added since the
        # CSV was written get fresh p=0 rows; rows whose files vanished are
        # dropped instead of crashing load_mat mid-sweep
        known = set(df["data"])
        new = [f for f in files if f not in known]
        if new:
            df = pd.concat([df, pd.DataFrame(
                {"data": new, "p": np.zeros(len(new))})], ignore_index=True)
        df = df[df["data"].isin(set(files))].reset_index(drop=True)
    else:
        df = pd.DataFrame({"data": files, "p": np.zeros(len(files))})

    t0 = time.time()
    todo = df.index[df["p"] == 0].tolist()
    # instances are searched `group` at a time in lockstep, sharing device
    # launches across graphs (DiverAgent.solve_mwis_bsf_many)
    done_cnt = 0
    for start in range(0, len(todo), ns.group):
        chunk = todo[start: start + ns.group]
        insts = [load_mat(os.path.join(cfg.datapath, df.loc[i, "data"]))
                 for i in chunk]
        results = agent.solve_mwis_bsf_many(
            [(inst.adj, inst.weights) for inst in insts],
            max_pops=ns.max_pops, batch_pops=ns.batch_pops, group=ns.group)
        for idx, inst, (_, util) in zip(chunk, insts, results):
            _, gutil = greedy_search(inst.adj, inst.weights)
            df.loc[idx, "p"] = util / gutil if gutil else 1.0
        done_cnt += len(chunk)
        if done_cnt % 24 < ns.group or done_cnt == len(todo):
            df.to_csv(out_csv)
            done = df[df["p"] > 0]
            print(f"{done_cnt}/{len(todo)}  mean p so far: "
                  f"{done['p'].mean():.6f}  "
                  f"({done_cnt / (time.time() - t0):.2f} graphs/s)",
                  flush=True)
    df.to_csv(out_csv)
    solved = df[df["p"] > 0]
    print(f"rollout sweep: {len(solved)}/{len(df)} instances, mean ratio "
          f"vs greedy {solved['p'].mean():.6f} -> {out_csv}")
    return float(solved["p"].mean())


if __name__ == "__main__":
    main()

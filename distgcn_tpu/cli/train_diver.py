"""Supervised GCN_DEEP_DIVER training driver.

Trains the diverse-head model (gcn/models.py:301-438, reference's
ICASSP2021 tree-search backbone — see SURVEY §2.3 `mwis_rollout_call`) on
labeled MWIS datasets: hindsight-min weighted CE against the `mwis_label`
field (Data_Generation.py:218-219), max-over-heads solution quality as the
checkpoint gate. Graphs train in padded device batches, one jitted step
per bucket.

Usage:
    python -m distgcn_tpu.cli.train_diver \
        --datapath=.../ER_Graph_Uniform_mixN_mixp_train0 \
        --test_datapath=.../ER_Graph_Uniform_GEN21_test1 \
        --num_layer=20 --hidden1=32 --diver_num=32 --feature_size=1 \
        --learning_rate=1e-4 --epochs=3
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax.numpy as jnp

from distgcn_tpu.agents import build_state_arrays
from distgcn_tpu.agents_extra import DiverAgent
from distgcn_tpu.core.graph import GraphBatch, pad_bucket
from distgcn_tpu.data.matio import load_dataset_cached
from distgcn_tpu.rl.train import make_optimizer, make_supervised_diver_step
from distgcn_tpu.utils.config import Config
from distgcn_tpu.utils.directory import find_model_folder


def main(argv=None, max_graphs_per_epoch=None):
    cfg = Config.from_args(argv)
    import argparse
    extra = argparse.ArgumentParser()
    extra.add_argument("--model_root", default="./model")
    extra.add_argument("--device_batch", type=int, default=64)
    ns, _ = extra.parse_known_args(argv)

    agent = DiverAgent(cfg)
    model_origin = find_model_folder(cfg, "diver", ns.model_root)
    agent.load(model_origin)

    train = [i for i in load_dataset_cached(cfg.datapath)
             if i.mwis_label is not None]
    test = load_dataset_cached(cfg.test_datapath)
    if not train:
        raise SystemExit(f"no labeled instances in {cfg.datapath}")
    print(f"{len(train)} labeled train / {len(test)} test graphs",
          flush=True)

    optimizer = make_optimizer(cfg.learning_rate, cfg.learning_decay)
    opt_state = optimizer.init(agent.params)
    step = make_supervised_diver_step(agent.model, optimizer, cfg.diver_num)

    rng = np.random.default_rng(cfg.seed)
    best_ratio = 0.0
    bs = ns.device_batch
    for epoch in range(cfg.epochs):
        order = rng.permutation(len(train))
        if max_graphs_per_epoch:
            order = order[:max_graphs_per_epoch]
        losses = []
        t0 = time.time()
        for start in range(0, len(order), bs):
            batch = [train[i] for i in order[start: start + bs]]
            nmax = max(i.num_nodes for i in batch)
            pad = pad_bucket(nmax, cfg.pad_to)
            gb = GraphBatch.from_scipy([i.adj for i in batch],
                                       [i.weights for i in batch],
                                       pad_to=pad)
            labels = np.zeros((len(batch), pad), np.float32)
            for j, inst in enumerate(batch):
                labels[j, : inst.num_nodes] = np.asarray(
                    inst.mwis_label, np.float32).flatten()
            features, supports = build_state_arrays(
                gb.adj, gb.wts, gb.mask, cfg.feature_size, cfg.max_degree,
                cfg.predict, agent.feature_mode)
            agent.params, opt_state, loss = step(
                agent.params, opt_state, features, supports, gb.mask,
                jnp.asarray(labels), gb.wts)
            losses.append(float(loss))

        # eval: max-over-heads tree search quality vs stored optimal utility,
        # plus the reference's hindsight max-over-heads accuracy/F1
        # (gcn/models.py:344-361) on labeled test instances
        from distgcn_tpu.rl.losses import (hindsight_diver_accuracy,
                                           hindsight_diver_f1)
        ratios, accs, f1s = [], [], []
        for inst in test[: min(len(test), 50)]:
            _, util = agent.solve_mwis_iterative(inst.adj, inst.weights)
            ref = inst.mwis_utility or inst.greedy_utility or 1.0
            ratios.append(util / ref)
            if inst.mwis_label is not None:
                state = agent.makestate(inst.adj, inst.weights)
                gb2 = state["graph"]
                out = agent._forward_fn(agent.params, state["features"],
                                        state["supports"], gb2.mask)
                logits = jnp.asarray(out[0, : inst.num_nodes, :])
                lab = jnp.asarray(np.asarray(inst.mwis_label,
                                             np.float32).flatten())
                accs.append(float(hindsight_diver_accuracy(
                    logits, lab, cfg.diver_num)))
                f1s.append(float(hindsight_diver_f1(
                    logits, lab, cfg.diver_num)[0]))
        ratio = float(np.mean(ratios))
        acc_s = f" Acc: {np.mean(accs):.4f} F1: {np.mean(f1s):.4f}" \
            if accs else ""
        print(f"Epoch: {epoch} Loss: {np.mean(losses):.6f} "
              f"Test/Opt_Ratio: {ratio:.6f}{acc_s} runtime: "
              f"{time.time() - t0:.1f}s", flush=True)
        if ratio > best_ratio:
            agent.save(model_origin)
            best_ratio = ratio
    return best_ratio


if __name__ == "__main__":
    main()

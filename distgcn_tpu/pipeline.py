"""Fused device pipeline: state -> GCN -> LGS -> utility, one XLA program.

This is the TPU-native replacement for the reference's per-graph
feed_dict forward (`mwis_gdpg_call.py:690-694`) followed by the host python
LGS loop (`heuristics.py:77-116`): a whole batch of padded graphs goes
through support construction, the GCN forward, the LGS solve and utility
reduction in a single `jit` — no host round-trips, one launch per batch.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from distgcn_tpu.agents import build_state_arrays
from distgcn_tpu.core.graph import GraphBatch, pad_bucket
from distgcn_tpu.ops.lgs import batched_lgs
from distgcn_tpu.utils.config import Config


def make_solve_pipeline(model, flags: Config, feature_mode: str = "gdpg",
                        with_baseline: bool = True):
    """Returns jitted solve(params, adj, wts, mask) ->
    (sel [B,N] int8, util [B], greedy-baseline util [B]).

    with_baseline=False skips the second LGS sweep that computes the
    greedy baseline (returned gutil is zeros then) — production
    scheduling only needs the schedule, and the baseline sweep roughly
    doubles the solver cost of the streaming path.
    """

    bf16 = getattr(flags, "compute_dtype", "float32") == "bfloat16"

    @jax.jit
    def solve(params, adj, wts, mask):
        features, supports = build_state_arrays(
            adj, wts, mask, flags.feature_size, flags.max_degree,
            flags.predict, feature_mode)
        if bf16:
            # GCN scoring in bf16 (native MXU dtype, half the support HBM
            # traffic); solver-side weight math stays f32 so LGS tie-breaks
            # and utilities are unchanged.
            features = features.astype(jnp.bfloat16)
            supports = supports.astype(jnp.bfloat16)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params)
        out = model.apply({"params": params}, features, supports)
        act = out[..., 0].astype(wts.dtype) * mask
        gcn_wts = act * wts if flags.predict == "mwis" else act
        sel, _, _ = batched_lgs(adj, gcn_wts, mask)
        util = jnp.sum(jnp.where(sel == 1, wts, 0.0), axis=-1)
        if not with_baseline:
            return sel, util, jnp.zeros_like(util)
        # greedy baseline on the same device pass (greedy == LGS on raw w)
        gsel, gutil, _ = batched_lgs(adj, wts, mask)
        return sel, util, gutil

    return solve


def make_train_pipeline(model, flags: Config, feature_mode: str = "gdpg"):
    """Training variant of `make_solve_pipeline` with the reference's
    epsilon-greedy VALUE exploration (mwis_gdpg_call.py:696-705: with
    probability epsilon the per-node scores are replaced by U(0,1) draws
    before the LGS; the memorized act_vals are those random draws).

    Returns jitted solve(params, adj, wts, mask, rand, explore) ->
    (sel [B,N] int8, util [B], greedy-baseline util [B], acts [B,N,H])
    where rand [B,N] are uniform draws, explore [B] bool selects the
    graphs that explore this step, and acts is the value tensor actually
    used (model outputs, with head 0 overwritten by rand on explored
    graphs) — exactly what the reference memorizes for replay targets.
    """

    bf16 = getattr(flags, "compute_dtype", "float32") == "bfloat16"

    @jax.jit
    def solve(params, adj, wts, mask, rand, explore):
        features, supports = build_state_arrays(
            adj, wts, mask, flags.feature_size, flags.max_degree,
            flags.predict, feature_mode)
        if bf16:
            features = features.astype(jnp.bfloat16)
            supports = supports.astype(jnp.bfloat16)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params)
        out = model.apply({"params": params}, features, supports)
        out = out.astype(wts.dtype)
        ex = explore[:, None].astype(wts.dtype)
        act0 = out[..., 0] * mask
        act0 = ex * rand * mask + (1.0 - ex) * act0
        acts = out.at[..., 0].set(act0)
        gcn_wts = act0 * wts if flags.predict == "mwis" else act0
        sel, _, _ = batched_lgs(adj, gcn_wts, mask)
        util = jnp.sum(jnp.where(sel == 1, wts, 0.0), axis=-1)
        gsel, gutil, _ = batched_lgs(adj, wts, mask)
        return sel, util, gutil, acts

    return solve


def make_resident_pipeline(model, flags: Config, feature_mode: str = "gdpg"):
    """Returns jitted solve(params, supports, adjb, wts, mask) ->
    (sel [B,N] int8, util [B]) for a PINNED graph: the support stack
    [B,S,N,N] (the biggest per-solve stream) and the boolean adjacency are
    precomputed once by `agents.MWISSolver.prepare`; per slot only the
    weight vector and the [B,N,F] features change (wireless_dqn_test.py's
    static-graph/changing-utilities workload)."""
    from distgcn_tpu.agents import build_features

    bf16 = getattr(flags, "compute_dtype", "float32") == "bfloat16"

    @jax.jit
    def solve(params, supports, adjb, wts, mask):
        features = build_features(wts, mask, flags.feature_size,
                                  flags.predict, feature_mode)
        if bf16:
            features = features.astype(jnp.bfloat16)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params)
        out = model.apply({"params": params}, features, supports)
        act = out[..., 0].astype(wts.dtype) * mask
        gcn_wts = act * wts if flags.predict == "mwis" else act
        sel, _, _ = batched_lgs(adjb, gcn_wts, mask)
        util = jnp.sum(jnp.where(sel == 1, wts, 0.0), axis=-1)
        return sel, util

    return solve


class BatchedEvaluator:
    """Evaluate an agent's GCN-LGS over a dataset in device batches.

    Groups instances into padding buckets, one compiled program per bucket,
    `batch_size` graphs per launch.
    """

    def __init__(self, agent, batch_size: int = 64):
        self.agent = agent
        self.batch_size = batch_size
        self._pipe = make_solve_pipeline(agent.model, agent.flags,
                                         agent.feature_mode)

    def evaluate(self, instances) -> Tuple[np.ndarray, np.ndarray]:
        """instances: list of (adj, wts). Returns (gcn_utils, greedy_utils)."""
        order = np.argsort([a.shape[0] for a, _ in instances], kind="stable")
        utils = np.zeros(len(instances))
        gutils = np.zeros(len(instances))
        pad_to = self.agent.flags.pad_to
        i = 0
        while i < len(order):
            chunk = order[i: i + self.batch_size]
            adjs = [instances[j][0] for j in chunk]
            wtss = [instances[j][1] for j in chunk]
            bucket = pad_bucket(max(a.shape[0] for a in adjs), pad_to)
            gb = GraphBatch.from_scipy(adjs, wtss, pad_to=bucket)
            sel, util, gutil = self._pipe(self.agent.params, gb.adj, gb.wts,
                                          gb.mask)
            utils[chunk] = np.asarray(util)
            gutils[chunk] = np.asarray(gutil)
            i += self.batch_size
        return utils, gutils

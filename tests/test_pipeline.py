"""Fused-pipeline and resident-fast-path tests.

Covers `distgcn_tpu/pipeline.py` (the single-launch batch solve that
replaces the reference's per-graph feed_dict forward,
`mwis_gdpg_call.py:690-694`, + host LGS loop, `heuristics.py:77-116`)
and the `prepare`/`solve_mwis_resident` weight-streaming path used by the
wireless per-timeslot workload.
"""

import numpy as np
import pytest

from conftest import random_graph
from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.pipeline import BatchedEvaluator, make_solve_pipeline
from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.solvers.greedy import greedy_search, local_greedy_search
from distgcn_tpu.utils.config import Config


def small_cfg(**kw):
    base = dict(feature_size=1, hidden1=8, num_layer=2, diver_num=1,
                max_degree=1, predict="mwis", epsilon=0.0, pad_to=64,
                learning_rate=1e-3)
    base.update(kw)
    return Config(**base)


def _graphs(rng, k=12, lo=20, hi=60):
    out = []
    for _ in range(k):
        n = int(rng.integers(lo, hi))
        out.append((random_graph(rng, n, 0.1), rng.random(n)))
    return out


def test_batched_evaluator_matches_per_graph_solve(rng):
    """One compiled launch per bucket must equal the per-graph agent path."""
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    instances = _graphs(rng)
    ev = BatchedEvaluator(agent, batch_size=5)
    utils, gutils = ev.evaluate(instances)
    for i, (a, w) in enumerate(instances):
        mwis, util = agent.solve_mwis(a, w)
        assert utils[i] == pytest.approx(util, abs=1e-4)
        _, grd = greedy_search(a, w)
        assert gutils[i] == pytest.approx(grd, abs=1e-4)


def test_pipeline_greedy_lane_matches_host_greedy(rng):
    """The pipeline's baseline lane (LGS on raw weights) equals centralized
    greedy: LGS is the synchronous parallelization of the sequential greedy
    (`heuristics.py:13-35` vs `:77-116`)."""
    agent = DQNAgent(small_cfg(num_layer=1), model_family="gcn_dqn")
    pipe = make_solve_pipeline(agent.model, agent.flags, agent.feature_mode)
    instances = _graphs(rng, k=6, lo=30, hi=64)
    adjs = [a for a, _ in instances]
    wtss = [w for _, w in instances]
    gb = GraphBatch.from_scipy(adjs, wtss, pad_to=64)
    _, _, gutil = pipe(agent.params, gb.adj, gb.wts, gb.mask)
    for i, (a, w) in enumerate(instances):
        _, host_grd = greedy_search(a, w)
        _, host_lgs = local_greedy_search(a, w)
        assert host_grd == pytest.approx(host_lgs, abs=1e-6)
        assert float(gutil[i]) == pytest.approx(host_grd, abs=1e-4)


def test_resident_path_matches_solve_mwis(rng):
    """prepare() once + solve_mwis_resident(w_t) per slot must equal the
    full solve_mwis on every weight vector."""
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, 48, 0.12)
    handle = agent.prepare(a)
    for _ in range(4):
        w = rng.random(48)
        mwis_r, util_r = agent.solve_mwis_resident(handle, w)
        mwis, util = agent.solve_mwis(a, w)
        assert mwis_r == mwis
        assert util_r == pytest.approx(util, abs=1e-4)


def test_resident_path_zero_weights(rng):
    """All-zero utilities (empty queues) must yield an empty schedule, not
    a crash — the reference early-exits on np.sum(wts)<=0
    (`mwis_gdpg_call.py:298-299`)."""
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, 32, 0.1)
    handle = agent.prepare(a)
    mwis, util = agent.solve_mwis_resident(handle, np.zeros(32))
    assert util == pytest.approx(0.0, abs=1e-6)


def test_bfloat16_mode_quality_close_to_f32(rng):
    """compute_dtype='bfloat16' scores in bf16 but must keep LGS exactness
    machinery (f32 weights) — mean utility within 0.5% of the f32 pipeline
    (measured -0.001 on GEN21_test1 with reference checkpoints)."""
    inst = _graphs(rng, k=10)
    res = {}
    for dt in ("float32", "bfloat16"):
        agent = DQNAgent(small_cfg(compute_dtype=dt), model_family="gcn_dqn")
        ev = BatchedEvaluator(agent, batch_size=5)
        utils, gutils = ev.evaluate(inst)
        res[dt] = np.sum(utils) / np.sum(gutils)
    assert abs(res["bfloat16"] - res["float32"]) < 0.005


def test_start_epoch_schedule_restoration():
    """--start_epoch restores the reference epsilon-reset schedule state
    (mwis_gdpg_train.py:77,175-177: epsilon_val = 0.2^|{r in {5,10,15,20}:
    r <= start}|), not a fresh low epsilon."""
    from distgcn_tpu.cli.train_gdpg import schedule_epsilon

    assert schedule_epsilon(0) == 1.0
    assert schedule_epsilon(4) == 1.0
    assert schedule_epsilon(5) == 0.2
    assert schedule_epsilon(10) == 0.2 ** 2
    assert schedule_epsilon(14) == 0.2 ** 2
    assert schedule_epsilon(20) == 0.2 ** 4

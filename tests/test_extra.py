"""Tests: extra agent families, LP relaxations, CLI drivers."""

import os

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import random_graph
from distgcn_tpu.agents_extra import DiverAgent, LegacyDQNAgent, MLPAgent
from distgcn_tpu.solvers import relax
from distgcn_tpu.solvers.greedy import greedy_search
from distgcn_tpu.utils.config import Config


def small_cfg(**kw):
    base = dict(feature_size=1, hidden1=8, num_layer=1, diver_num=1,
                max_degree=1, predict="mwis", epsilon=0.0, pad_to=64,
                learning_rate=1e-3)
    base.update(kw)
    return Config(**base)


def check_is(adj, sel):
    adj = sp.csr_matrix(adj)
    ss = sorted(sel)
    for v in ss:
        assert not (set(adj.indices[adj.indptr[v]: adj.indptr[v + 1]]) &
                    set(ss))


def test_legacy_dqn_agent_replay_keeps_memory(rng):
    agent = LegacyDQNAgent(small_cfg(epsilon=0.3))
    a = random_graph(rng, 40, 0.1)
    w = rng.random(40)
    for _ in range(6):
        agent.solve_mwis(a, w, train=True, grd=1.0)
    loss = agent.replay(6)
    assert loss is not None and np.isfinite(loss)
    assert len(agent.memory) == 6   # retained (mwis_dqn_call.py:151-186)


def test_mlp_agent_solves(rng):
    agent = MLPAgent(small_cfg(num_layer=3))
    a = random_graph(rng, 40, 0.1)
    w = rng.random(40)
    mwis, util = agent.solve_mwis(a, w)
    check_is(a, mwis)
    assert util > 0


def test_diver_agent_iterative(rng):
    agent = DiverAgent(small_cfg(num_layer=3, diver_num=4, backoff_prob=0.9))
    a = random_graph(rng, 40, 0.12)
    w = rng.random(40)
    mwis, util = agent.solve_mwis_iterative(a, w)
    check_is(a, mwis)
    assert util > 0


def _two_star_trap():
    """Adversarial instance: two disjoint stars, centers weight 10, four
    leaves of weight 3 each. Score-guided LGS picks both centers (util 20);
    the optimum is all leaves (util 24) and requires excluding BOTH centers
    simultaneously — unreachable for the single-drop 4-pass backoff, which
    re-drops from a fresh weight copy each pass."""
    n = 10
    a = np.zeros((n, n), np.float32)
    for c, leaves in ((0, range(1, 5)), (5, range(6, 10))):
        for l in leaves:
            a[c, l] = a[l, c] = 1.0
    w = np.full(n, 3.0)
    w[0] = w[5] = 10.0
    return sp.csr_matrix(a), w


def test_bsf_search_beats_bounded_backoff():
    """The best-solution-first queue (solve_mwis_bsf) escapes the two-level
    trap; the bounded 4-pass backoff cannot (VERDICT r1 item 6)."""
    cfg = small_cfg(num_layer=2, diver_num=4, backoff_prob=1.0,
                    diver_out=4, hidden1=4)
    agent = DiverAgent(cfg, seed=0)
    # zero the final layer -> all logits 0 -> every head scores 0.5:
    # guided LGS == plain LGS on w, deterministic trap
    import jax.numpy as jnp
    last = f"gc{cfg.num_layer}"
    agent.params = dict(agent.params)
    agent.params[last] = {k: jnp.zeros_like(v)
                          for k, v in agent.params[last].items()}
    a, w = _two_star_trap()

    sets, utils = [], []
    for seed in range(5):
        agent._rng = np.random.default_rng(seed)
        s, u = agent.solve_mwis_iterative(a, w)
        check_is(a, s)
        sets.append(s)
        utils.append(u)
    assert max(utils) < 24.0   # bounded backoff never reaches the optimum

    agent._rng = np.random.default_rng(0)
    s, u = agent.solve_mwis_bsf(a, w, max_pops=32)
    check_is(a, s)
    assert u == 24.0           # bsf finds it
    assert s == set(range(1, 5)) | set(range(6, 10))


def test_bsf_routes_rollout_entry(rng):
    """DGCN-RS / CGCN-RS-Seq route through the tree search for DiverAgent."""
    agent = DiverAgent(small_cfg(num_layer=2, diver_num=2, backoff_prob=0.5))
    a = random_graph(rng, 30, 0.12)
    w = rng.random(30)
    mwis, util = agent.solve_mwis_rollout_wrap(a, w)
    check_is(a, mwis)
    assert util > 0


def test_lp_edge_relax_bounds(rng):
    a = random_graph(rng, 40, 0.1)
    w = rng.random(40)
    x = relax.mwis_lp_edge_relax(a, w)
    assert x is not None
    lp_val = float(w @ x)
    _, gval = greedy_search(a, w)
    assert lp_val >= gval - 1e-6          # LP upper-bounds the IP
    # half-integrality of the edge LP
    frac = x[(x > 1e-6) & (x < 1 - 1e-6)]
    assert np.allclose(frac, 0.5, atol=1e-6)


def test_lp_clique_relax_tighter_than_edge(rng):
    a = random_graph(rng, 35, 0.15)
    w = rng.random(35)
    xe = relax.mwis_lp_edge_relax(a, w)
    xc = relax.mwis_lp_clique_relax(a, w)
    assert float(w @ xc) <= float(w @ xe) + 1e-6


def test_mp_greedy_valid(rng):
    a = random_graph(rng, 50, 0.1)
    w = rng.random(50)
    sel, util = relax.mp_greedy(a, w)
    check_is(a, sel)
    assert util > 0


def test_lp_edge_dual_covers(rng):
    a = random_graph(rng, 30, 0.15)
    w = rng.random(30)
    # ensure no isolated nodes (dual needs at least one edge each)
    keep = np.asarray(a.sum(1)).flatten() > 0
    idx = np.nonzero(keep)[0]
    a2 = sp.csr_matrix(a.toarray()[np.ix_(idx, idx)])
    w2 = w[idx]
    prices = relax.mwis_lp_edge_dual(a2, w2)
    row_sum = np.asarray(prices.sum(axis=1)).flatten()
    assert (row_sum >= w2 - 1e-6).all()


def test_gen_data_cli(tmp_path):
    from distgcn_tpu.cli.gen_data import main
    n = main([f"--datapath={tmp_path}/g", "--type=ER", "--sizes=20",
              "--ps=0.2", "--n=3", "--seed=1"])
    assert n == 3
    files = os.listdir(f"{tmp_path}/g")
    assert len(files) == 3 and all(f.endswith("_uni.mat") for f in files)
    from distgcn_tpu.data.matio import load_mat, extract_n
    inst = load_mat(os.path.join(f"{tmp_path}/g", files[0]))
    assert inst.mwis_utility >= inst.greedy_utility - 1e-9
    assert extract_n(files[0]) == 20


def test_benchmark_solver_cli(tmp_path, rng):
    from distgcn_tpu.cli.gen_data import main as gen
    from distgcn_tpu.cli.benchmark_solver import main as bench
    gen([f"--datapath={tmp_path}/g", "--type=ER", "--sizes=25", "--ps=0.15",
         "--n=3", "--seed=2", "--no_label"])
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        df = bench([f"--datapath={tmp_path}/g", "--solver=optimal",
                    "--timeout=5"])
    finally:
        os.chdir(cwd)
    assert (df["p"] >= 1.0 - 1e-9).all()  # optimal >= greedy
    assert (df["status"] == "Optimal").all()


def test_supervised_diver_training_improves_loss(tmp_path, rng):
    """cli/train_diver: hindsight-CE supervised training on labeled data
    runs end-to-end and the trained model's tree search stays valid."""
    import jax
    from distgcn_tpu.cli.train_diver import main as diver_main
    from distgcn_tpu.data.matio import save_mat
    from distgcn_tpu.solvers.greedy import greedy_search

    d = tmp_path / "ds"
    d.mkdir()
    for i in range(8):
        n = 30
        a = random_graph(rng, n, 0.15)
        w = rng.random(n)
        # label = greedy IS (a valid independent set)
        sel, util = greedy_search(a, w)
        lab = np.zeros(n)
        lab[list(sel)] = 1.0
        save_mat(str(d / f"ER_n{n}_p0.15_b{i}_uni.mat"), a, w,
                 mwis_label=lab.reshape(1, -1),
                 mwis_utility=np.array([[util]]),
                 greedy_utility=np.array([[util]]))
    best = diver_main([f"--datapath={d}", f"--test_datapath={d}",
                       "--training_set=DIVUT", "--num_layer=3",
                       "--hidden1=8", "--diver_num=2", "--feature_size=1",
                       "--max_degree=1", "--predict=mwis", "--epochs=2",
                       "--learning_rate=1e-3", "--epsilon=0",
                       "--backoff_prob=0.0",
                       f"--model_root={tmp_path / 'model'}"])
    assert best > 0.5  # tree search finds real independent sets


def test_label_instance_exact(rng):
    from distgcn_tpu.data.generate import label_instance
    from conftest import random_graph
    a = random_graph(rng, n=25, p=0.15)
    w = rng.random(25) + 0.1
    mwis, val, grd = label_instance(a, w, exact=True)
    mh, vh, _ = label_instance(a, w, rng=rng)
    assert val >= vh - 1e-9  # exact label >= heuristic label
    ii = sorted(mwis)
    assert a[ii][:, ii].nnz == 0


def test_resident_masked_eval_matches_subgraph_extraction(rng):
    """The r5 device-resident masked evaluation must equal explicit
    subgraph extraction: masked-degree supports == extracted-subgraph
    supports (scattered), the GCN is permutation-equivariant, and the
    guided-LGS (weight, -id) tie order is preserved under extraction."""
    import jax.numpy as jnp
    from distgcn_tpu.agents import build_state_arrays
    from distgcn_tpu.core.graph import GraphBatch, pad_bucket
    from distgcn_tpu.ops.lgs import batched_lgs_multi

    cfg = small_cfg(num_layer=2, diver_num=3, hidden1=4)
    agent = DiverAgent(cfg, seed=1)
    a = random_graph(rng, 40, 0.15)
    n = a.shape[0]
    w = rng.random(n).astype(np.float32) + 0.1
    keep = rng.random(n) < 0.6                 # a partial state's remainder
    keep[:2] = True
    bucket = pad_bucket(n, cfg.pad_to)

    # resident masked path
    adjs_dev = agent._resident_adjs([a], bucket)
    masks = np.zeros((1, bucket), np.float32)
    masks[0, np.nonzero(keep)[0]] = 1.0
    wfull = np.zeros(bucket, np.float32)
    wfull[:n] = w
    sels, probs = agent._eval_heads_resident(
        adjs_dev, np.zeros(1, np.int32), masks, masks * wfull[None], [n])
    sel_r, probs_r = sels[0], probs[0]

    # explicit extraction path (the pre-r5 semantics, done by hand)
    ridx = np.nonzero(keep)[0]
    sub = sp.csr_matrix(a)[ridx][:, ridx]
    gb = GraphBatch.from_scipy([sub], [w[ridx]], pad_to=bucket)
    feats, sups = build_state_arrays(
        gb.adj, gb.wts, gb.mask, cfg.feature_size, cfg.max_degree,
        cfg.predict, agent.feature_mode)
    out = np.asarray(agent.model.apply({"params": agent.params}, feats,
                                       sups) * gb.mask[..., None])
    d = cfg.diver_num
    heads = out[0, :, : 2 * d].reshape(bucket, d, 2)
    e = np.exp(heads - heads.max(-1, keepdims=True))
    probs_x = (e / e.sum(-1, keepdims=True))[..., 1][: len(ridx)]
    np.testing.assert_allclose(probs_r[ridx], probs_x, atol=1e-5,
                               err_msg="head scores differ")
    guided = np.zeros((1, d, bucket), np.float32)
    guided[0, :, : len(ridx)] = probs_x.T * w[ridx]
    sel_x, _, _ = batched_lgs_multi(gb.adj, jnp.asarray(guided), gb.mask)
    sel_x = np.asarray(sel_x)[0, :, : len(ridx)]
    # compare selected node sets per head (global vs compacted ids)
    for k in range(d):
        got = set(np.nonzero(sel_r[k] == 1)[0].tolist())
        ref = set(ridx[np.nonzero(sel_x[k] == 1)[0]].tolist())
        assert got == ref, f"head {k}: {got} != {ref}"

"""Agent API tests: solve paths, replay training, iterative solvers."""

import os

import numpy as np
import pytest

from conftest import random_graph
from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.solvers.greedy import greedy_search, local_greedy_search
from distgcn_tpu.utils.config import Config

REF_DATA = "/root/reference/data/ER_Graph_Uniform_GEN21_test2"
REF_MODEL = ("/root/reference/model/"
             "result_IS4SAT_deep_ld1_c32_l1_cheb1_diver1_mwis_dqn")


def small_cfg(**kw):
    base = dict(feature_size=1, hidden1=8, num_layer=1, diver_num=1,
                max_degree=1, predict="mwis", epsilon=0.0, pad_to=64,
                learning_rate=1e-3)
    base.update(kw)
    return Config(**base)


def check_is(adj, sel):
    import scipy.sparse as sp
    adj = sp.csr_matrix(adj)
    sel = sorted(sel)
    for v in sel:
        nbrs = set(adj.indices[adj.indptr[v]: adj.indptr[v + 1]].tolist())
        assert not nbrs.intersection(sel)


def test_solve_mwis_returns_valid_is(rng):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, 50, 0.1)
    w = rng.random(50)
    mwis, util = agent.solve_mwis(a, w)
    check_is(a, mwis)
    assert abs(util - w[list(mwis)].sum()) < 1e-5


def test_solve_mwis_train_memorizes(rng):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, 40, 0.1)
    w = rng.random(40)
    _, grd = greedy_search(a, w)
    mwis, util = agent.solve_mwis(a, w, train=True, grd=grd)
    assert len(agent.memory) == 1
    state, act_vals, action, nxt, reward = agent.memory[0]
    assert set(action) == mwis
    assert reward == pytest.approx(util / (grd + 1e-6))


def test_replay_updates_params_and_decays_epsilon(rng):
    agent = DQNAgent(small_cfg(epsilon=0.5), model_family="gcn_dqn")
    for _ in range(6):
        a = random_graph(rng, 30, 0.15)
        w = rng.random(30)
        _, grd = greedy_search(a, w)
        agent.solve_mwis(a, w, train=True, grd=grd)
    import jax
    before = jax.tree_util.tree_map(np.asarray, agent.params)
    eps0 = agent.epsilon
    loss = agent.replay(6)
    assert loss is not None and np.isfinite(loss)
    after = agent.params
    changed = any(
        not np.allclose(np.asarray(a_), b_)
        for a_, b_ in zip(jax.tree_util.tree_leaves(after),
                          jax.tree_util.tree_leaves(before)))
    assert changed
    assert len(agent.memory) == 0          # cleared (mwis_gdpg_call.py:761)
    assert agent.epsilon < eps0            # decayed


def test_replay_insufficient_memory_returns_none(rng):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    assert agent.replay(10) is None


def test_iterative_solvers_valid(rng):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, 40, 0.12)
    w = rng.random(40)
    for fn in (agent.solve_mwis_dit, agent.solve_mwis_cit_wrap,
               agent.solve_mwis_rollout_wrap):
        mwis, util = fn(a, w)
        check_is(a, mwis)
        assert util > 0
        # maximality under positive weights: every non-member has a member
        # neighbor (all these solvers run to exhaustion)
        import scipy.sparse as sp
        adjc = sp.csr_matrix(a)
        for v in range(40):
            if v in mwis:
                continue
            nbrs = set(adjc.indices[adjc.indptr[v]: adjc.indptr[v + 1]].tolist())
            assert nbrs.intersection(mwis), f"node {v} unblocked non-member"


def test_cgs_episodic_train_memorizes(rng):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, 25, 0.2)
    w = rng.random(25)
    mwis, util = agent.solve_mwis_cgs_train(a, w, train=True, grd=1.0)
    check_is(a, mwis)
    assert len(agent.memory) == len(mwis)  # one memory per committed node


def test_save_load_roundtrip(tmp_path, rng):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    agent.save(str(tmp_path))
    agent2 = DQNAgent(small_cfg(), model_family="gcn_dqn", seed=1)
    assert agent2.load(str(tmp_path))
    import jax
    for x, y in zip(jax.tree_util.tree_leaves(agent.params),
                    jax.tree_util.tree_leaves(agent2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.skipif(not (os.path.isdir(REF_DATA) and os.path.isdir(REF_MODEL)),
                    reason="reference assets not mounted")
def test_reference_model_beats_greedy_on_gen21():
    pytest.importorskip("tensorflow")
    from distgcn_tpu.data.matio import load_mat, list_dataset
    cfg = Config(feature_size=1, hidden1=32, num_layer=1, diver_num=1,
                 max_degree=1, predict="mwis", epsilon=0.0, pad_to=128)
    agent = DQNAgent(cfg, model_family="gcn_dqn")
    assert agent.load(REF_MODEL)
    ratios = []
    for f in list_dataset(REF_DATA)[:15]:
        inst = load_mat(os.path.join(REF_DATA, f))
        _, grd = greedy_search(inst.adj, inst.weights)
        mwis, util = agent.solve_mwis(inst.adj, inst.weights)
        check_is(inst.adj, mwis)
        ratios.append(util / grd)
    # trained GCN reweighting must improve on the greedy baseline on average
    assert np.mean(ratios) > 1.0

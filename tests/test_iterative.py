"""Iterative solver parity: device masked loops vs host re-slicing oracle.

The oracle below implements the reference's re-slice semantics directly
(mwis_gdpg_call.py:278-318 DIT, :344-384 CGS): on each iteration rebuild the
reduced subgraph, run the same GCN forward, commit winners, repeat. The
device solvers keep fixed shapes and mask instead; results must match
exactly (same params, same graphs).
"""

import numpy as np
import pytest
import scipy.sparse as sp
import jax

from conftest import random_graph
from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.core import prep
from distgcn_tpu.solvers.greedy import local_greedy_search_nstep
from distgcn_tpu.utils.config import Config


def small_cfg(**kw):
    base = dict(feature_size=1, hidden1=8, num_layer=2, diver_num=1,
                max_degree=1, predict="mwis", epsilon=0.0, pad_to=64,
                learning_rate=1e-3)
    base.update(kw)
    return Config(**base)


def host_forward(params, adj_sub, n_layers):
    """Reference-semantics forward on the reduced subgraph: features = ones
    (row-normalized, F=1), supports = simple_polynomials."""
    sup = prep.simple_polynomials(adj_sub, 1)
    h = np.ones((adj_sub.shape[0], 1), np.float32)
    for li in range(1, n_layers + 1):
        lay = params[f"gc{li}"]
        out = sup[0] @ (h @ np.asarray(lay["w_0"])) \
            + sup[1] @ (h @ np.asarray(lay["w_1"]))
        if li < n_layers:
            out = np.where(out > 0, out, 0.2 * out)
        h = out.astype(np.float32)
    return h[:, 0]


def oracle_dit(params, adj, wts, n_layers):
    adj = sp.csr_matrix(adj)
    w = np.asarray(wts, dtype=np.float64).flatten()
    sel = -np.ones(w.size)
    while (sel == -1).any():
        remain = sel == -1
        if w[remain].sum() <= 0:
            break
        ridx = np.nonzero(remain)[0]
        sub = adj[ridx][:, ridx]
        act = host_forward(params, sub, n_layers)
        gcn_wts = act * w[ridx]
        s_part, _, nb = local_greedy_search_nstep(sub, gcn_wts, nstep=1)
        sel[ridx[list(s_part)]] = 1
        sel[ridx[list(nb)]] = 0
    util = float(np.dot(sel, w))
    return set(np.nonzero(sel == 1)[0].tolist()), util


def oracle_cgs(params, adj, wts, n_layers):
    adj = sp.csr_matrix(adj)
    w = np.asarray(wts, dtype=np.float64).flatten()
    sel = -np.ones(w.size)
    while (sel == -1).any():
        remain = sel == -1
        if w[remain].sum() <= 0:
            break
        ridx = np.nonzero(remain)[0]
        sub = adj[ridx][:, ridx]
        act = host_forward(params, sub, n_layers)
        gcn_wts = act * w[ridx]
        pick = int(np.argmax(gcn_wts))
        v = ridx[pick]
        sel[v] = 1
        nbrs = adj.indices[adj.indptr[v]: adj.indptr[v + 1]]
        sel[nbrs[sel[nbrs] == -1]] = 0
    util = float(np.dot(sel, w))
    return set(np.nonzero(sel == 1)[0].tolist()), util


@pytest.mark.parametrize("n,p", [(40, 0.1), (60, 0.06)])
def test_dit_matches_reslicing_oracle(rng, n, p):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, n, p)
    w = rng.random(n)
    params = jax.tree_util.tree_map(np.asarray, agent.params)
    want_set, want_util = oracle_dit(params, a, w, 2)
    got_set, got_util = agent.solve_mwis_dit(a, w)
    assert got_set == want_set
    assert got_util == pytest.approx(want_util, abs=1e-3)


@pytest.mark.parametrize("n,p", [(30, 0.15), (50, 0.08)])
def test_cgs_matches_reslicing_oracle(rng, n, p):
    agent = DQNAgent(small_cfg(), model_family="gcn_dqn")
    a = random_graph(rng, n, p)
    w = rng.random(n)
    params = jax.tree_util.tree_map(np.asarray, agent.params)
    want_set, want_util = oracle_cgs(params, a, w, 2)
    got_set, got_util = agent.solve_mwis_cit_wrap(a, w)
    assert got_set == want_set
    assert got_util == pytest.approx(want_util, abs=1e-3)

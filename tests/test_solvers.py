"""MWIS solver parity tests.

The oracle `spec_lgs` below is a direct transcription of the *documented*
LGS round semantics (heuristics.py:77-116): per round, with the remaining set
frozen, v joins iff it has no remaining neighbor or beats all remaining
neighbors by (weight, then smaller-id-on-tie); winners' remaining neighbors
are excluded. Our production implementations (vectorized host + device) must
match it node-for-node, including engineered ties.
"""

import numpy as np
import scipy.sparse as sp
import pytest

from conftest import random_graph
from distgcn_tpu.solvers import greedy as G
from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.ops.lgs import batched_lgs, lgs_round_counts


def spec_lgs(adj, wts):
    adj = sp.csr_matrix(adj)
    w = np.asarray(wts, dtype=float).flatten()
    n = w.size
    state = -np.ones(n)  # -1 remain, 0 excluded, 1 selected
    while (state == -1).any():
        remain = state == -1
        winners = []
        for v in np.nonzero(remain)[0]:
            nbrs = adj.indices[adj.indptr[v]: adj.indptr[v + 1]]
            nbrs = nbrs[remain[nbrs]]
            if nbrs.size == 0:
                winners.append(v)
                continue
            mx = w[nbrs].max()
            if w[v] > mx:
                winners.append(v)
            elif w[v] == mx and v < nbrs[w[nbrs] == mx].min():
                winners.append(v)
        for v in winners:
            state[v] = 1
            nbrs = adj.indices[adj.indptr[v]: adj.indptr[v + 1]]
            for u in nbrs:
                if state[u] == -1:
                    state[u] = 0
    sel = set(np.nonzero(state == 1)[0].tolist())
    return sel, float(w[list(sel)].sum()) if sel else 0.0


def check_is(adj, sel):
    adj = sp.csr_matrix(adj)
    sel = sorted(sel)
    for v in sel:
        nbrs = set(adj.indices[adj.indptr[v]: adj.indptr[v + 1]].tolist())
        assert not nbrs.intersection(sel), f"{v} conflicts in {sel}"


@pytest.mark.parametrize("n,p,tie", [(40, 0.1, False), (80, 0.05, False),
                                     (60, 0.15, True), (30, 0.3, True)])
def test_host_lgs_matches_spec(rng, n, p, tie):
    for trial in range(5):
        a = random_graph(rng, n, p)
        w = rng.random(n)
        if tie:  # quantize to force many ties
            w = np.round(w * 4) / 4
        want_set, want_util = spec_lgs(a, w)
        got_set, got_util = G.local_greedy_search(a, w)
        assert got_set == want_set
        assert abs(got_util - want_util) < 1e-9
        check_is(a, got_set)


def test_greedy_is_valid_and_beats_nothing(rng):
    for trial in range(5):
        a = random_graph(rng, 50, 0.1)
        w = rng.random(50)
        s, util = G.greedy_search(a, w)
        check_is(a, s)
        assert util > 0


def test_greedy_equals_lgs_under_stable_tiebreak(rng):
    # see ops/lgs.py docstring: the two solvers coincide under (w, -id) order
    for trial in range(10):
        a = random_graph(rng, 60, 0.12)
        w = np.round(rng.random(60) * 8) / 8
        s1, _ = G.greedy_search(a, w)
        s2, _ = G.local_greedy_search(a, w)
        assert s1 == s2


def test_dist_greedy_valid(rng):
    a = random_graph(rng, 70, 0.1)
    w = rng.random(70)
    s, util = G.dist_greedy_search(a, w, 0.1)
    check_is(a, s)
    assert util > 0


def test_nstep_partial(rng):
    a = random_graph(rng, 60, 0.1)
    w = rng.random(60)
    s1, u1, nb1 = G.local_greedy_search_nstep(a, w, nstep=1)
    sf, uf = G.local_greedy_search(a, w)
    assert s1.issubset(sf)
    assert u1 <= uf + 1e-9
    # one full run equals nstep with large n
    sbig, ubig, _ = G.local_greedy_search_nstep(a, w, nstep=1000)
    assert sbig == sf


def test_stats_counters(rng):
    a = random_graph(rng, 50, 0.1)
    w = rng.random(50)
    s, util, rounds, p2p, bst = G.local_greedy_search_stats(a, w)
    s0, u0 = G.local_greedy_search(a, w)
    assert s == s0 and abs(util - u0) < 1e-9
    assert rounds >= 1 and p2p >= 0 and bst >= len(s)
    s2, u2, r2, p2, b2, oh = G.local_greedy_search_overhead(a, w)
    assert s2 == s0
    assert oh.sum() == p2 + len(s2)


# -- device kernel parity ----------------------------------------------------

def test_device_lgs_matches_host(rng):
    graphs, wts = [], []
    for n, p, tie in [(40, 0.1, False), (77, 0.08, True), (120, 0.04, False),
                      (25, 0.3, True)]:
        a = random_graph(rng, n, p)
        w = rng.random(n)
        if tie:
            w = np.round(w * 4) / 4
        graphs.append(a)
        wts.append(w)
    gb = GraphBatch.from_scipy(graphs, wts, bucket=128)
    sel, util, rounds = batched_lgs(gb.adj, gb.wts, gb.mask)
    sel = np.asarray(sel)
    for i, (a, w) in enumerate(zip(graphs, wts)):
        want_set, want_util = G.local_greedy_search(a, w)
        n = a.shape[0]
        got_set = set(np.nonzero(sel[i, :n] == 1)[0].tolist())
        assert got_set == want_set, f"graph {i}"
        assert abs(float(util[i]) - want_util) < 1e-4
        # padding must stay unselected
        assert (sel[i, n:] == 0).all()


def test_device_lgs_counters_match_host(rng):
    a = random_graph(rng, 64, 0.1)
    w = rng.random(64)
    gb = GraphBatch.from_scipy([a], [w], bucket=64)
    sel, util, rounds, p2p, bst = lgs_round_counts(gb.adj, gb.wts, gb.mask)
    _, _, r0, p0, b0 = G.local_greedy_search_stats(a, w)
    assert int(rounds) == r0
    assert int(p2p[0]) == p0
    assert int(bst[0]) == b0


def test_device_lgs_nstep(rng):
    a = random_graph(rng, 60, 0.1)
    w = rng.random(60)
    gb = GraphBatch.from_scipy([a], [w], bucket=64)
    sel, util, rounds = batched_lgs(gb.adj, gb.wts, gb.mask, max_rounds=1)
    s1, u1, nb1 = G.local_greedy_search_nstep(a, w, nstep=1)
    got = set(np.nonzero(np.asarray(sel)[0, :60] == 1)[0].tolist())
    gotx = set(np.nonzero(np.asarray(sel)[0, :60] == 0)[0].tolist())
    assert got == s1
    assert gotx == nb1


def test_device_lgs_negative_and_zero_weights(rng):
    # gcn weights can be negative (leaky-relu/linear head outputs)
    a = random_graph(rng, 40, 0.15)
    w = rng.standard_normal(40)
    want, _ = G.local_greedy_search(a, w)
    gb = GraphBatch.from_scipy([a], [w], bucket=64)
    sel, _, _ = batched_lgs(gb.adj, gb.wts, gb.mask)
    got = set(np.nonzero(np.asarray(sel)[0, :40] == 1)[0].tolist())
    assert got == want


def test_device_lgs_unroll_invariant(rng):
    """batched_lgs executes `unroll` gated rounds per while_loop iteration
    (a perf lever); selections, utilities AND the reported round count
    must be bit-identical across unroll values, for the full solve and
    for every nstep cap (sub-rounds are masked on the cap and on the
    remaining set)."""
    graphs = [random_graph(rng, 50, p) for p in (0.05, 0.15, 0.3)]
    wts = [rng.standard_normal(50) for _ in graphs]
    wts[1][:20] = 0.5  # tie plateau: exercises the id tie-break path
    gb = GraphBatch.from_scipy(graphs, wts, bucket=64)
    for cap in (None, 1, 2, 3, 5):
        ref = batched_lgs(gb.adj, gb.wts, gb.mask, max_rounds=cap, unroll=1)
        for u in (2, 3, 4):
            got = batched_lgs(gb.adj, gb.wts, gb.mask, max_rounds=cap,
                              unroll=u)
            assert np.array_equal(np.asarray(got[0]), np.asarray(ref[0])), \
                (cap, u)
            np.testing.assert_allclose(np.asarray(got[1]),
                                       np.asarray(ref[1]), rtol=1e-6)
            assert int(got[2]) == int(ref[2]), (cap, u)

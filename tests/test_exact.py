"""Exact MWIS solver tests (native B&B + python fallback)."""

import itertools

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import random_graph
from distgcn_tpu.solvers.exact import (fast_greedy, fast_local_greedy,
                                       mwis_exact, _python_bnb, _csr)
from distgcn_tpu.solvers.greedy import greedy_search, local_greedy_search


def brute_force(adj, w):
    a = sp.csr_matrix(adj)
    n = w.size
    nbrs = [set(a.indices[a.indptr[v]: a.indptr[v + 1]]) for v in range(n)]
    best = 0.0
    for r in range(n + 1):
        for c in itertools.combinations(range(n), r):
            cs = set(c)
            if any(nbrs[v] & cs for v in c):
                continue
            best = max(best, w[list(c)].sum())
    return best


def check_is(adj, sel):
    a = sp.csr_matrix(adj)
    ss = set(int(v) for v in sel)
    for v in ss:
        assert not (set(a.indices[a.indptr[v]: a.indptr[v + 1]]) & ss)


def test_exact_matches_brute_force(rng):
    for _ in range(10):
        n = 12
        a = random_graph(rng, n, 0.3)
        w = rng.random(n)
        want = brute_force(a, w)
        solu, val, status = mwis_exact(a, w, 10)
        check_is(a, solu)
        assert status == "Optimal"
        assert val == pytest.approx(want, abs=1e-9)


def test_exact_beats_greedy(rng):
    a = random_graph(rng, 120, 0.05)
    w = rng.random(120)
    solu, val, status = mwis_exact(a, w, 20)
    _, gval = greedy_search(a, w)
    check_is(a, solu)
    assert val >= gval - 1e-9


def test_exact_empty_and_trivial():
    a = sp.csr_matrix((4, 4))
    w = np.array([1.0, 2.0, 3.0, 4.0])
    solu, val, status = mwis_exact(a, w, 5)
    assert val == pytest.approx(10.0)
    # single edge: takes the heavier endpoint
    a2 = sp.csr_matrix(np.array([[0, 1], [1, 0]], float))
    solu, val, _ = mwis_exact(a2, np.array([1.0, 5.0]), 5)
    assert set(solu.tolist()) == {1} and val == pytest.approx(5.0)


def test_python_fallback_matches_native(rng):
    for _ in range(3):
        n = 14
        a = random_graph(rng, n, 0.25)
        w = rng.random(n)
        _, val_native, _ = mwis_exact(a, w, 10)
        _, val_py, status = _python_bnb(_csr(a), w.astype(np.float64), 10)
        assert status == "Optimal"
        assert val_py == pytest.approx(val_native, abs=1e-9)


def test_fast_native_solvers_parity(rng):
    for _ in range(5):
        a = random_graph(rng, 70, 0.1)
        w = np.round(rng.random(70) * 8) / 8  # engineered ties
        assert fast_greedy(a, w)[0] == greedy_search(a, w)[0]
        assert fast_local_greedy(a, w)[0] == local_greedy_search(a, w)[0]


def test_all_maximal_is_enumeration(rng):
    from distgcn_tpu.solvers.exact import all_maximal_is, get_mwis, mwis_exact
    from conftest import random_graph
    for _ in range(3):
        a = random_graph(rng, n=14, p=0.25)
        mis_list = all_maximal_is(a)
        dense = a.toarray()
        seen = set()
        for mis in mis_list:
            t = tuple(mis)
            assert t not in seen
            seen.add(t)
            # independent
            for i in mis:
                for j in mis:
                    if i != j:
                        assert dense[i, j] == 0
            # maximal: every outside node has a neighbor inside
            for v in range(14):
                if v not in mis:
                    assert any(dense[v, u] for u in mis)
        # exhaustive best == exact B&B optimum (MWIS with positive weights
        # is always attained at a maximal set)
        w = rng.random(14) + 0.1
        s_enum, v_enum = get_mwis(a, w)
        _, v_bnb, status = mwis_exact(a, w, timeout=30.0)
        assert abs(v_enum - v_bnb) < 1e-9


def test_maxpool_aggregate(rng):
    import jax.numpy as jnp
    import numpy as np
    from distgcn_tpu.models.layers import maxpool_aggregate
    x = (rng.random((3, 6, 6)) < 0.5).astype(np.float32)
    y = rng.random((3, 6, 4)).astype(np.float32)
    out = np.asarray(maxpool_aggregate(jnp.asarray(x), jnp.asarray(y)))
    # oracle: reference loop semantics per feature (gcn/layers.py:41-47)
    for b in range(3):
        for f in range(4):
            expect = (x[b] @ np.diag(y[b, :, f])).max(axis=1)
            np.testing.assert_allclose(out[b, :, f], expect, rtol=1e-6)


def test_milp_cross_validates_native_bnb(rng):
    """Two unrelated exact engines (native B&B vs HiGHS MIP) must prove
    the same optimum on random instances."""
    from distgcn_tpu.solvers.exact import mwis_exact, mwis_milp
    from conftest import random_graph
    import numpy as np
    for n, p in [(30, 0.15), (60, 0.1), (60, 0.25)]:
        a = random_graph(rng, n, p)
        w = rng.random(n)
        _, u1, s1 = mwis_exact(a, w, 30.0)
        sel, u2, s2 = mwis_milp(a, w, 30.0)
        assert s1 == "Optimal" and s2 == "Optimal"
        assert abs(u1 - u2) < 1e-9 * max(1.0, u1)
        ch = np.nonzero(sel == 1)[0]
        assert a[np.ix_(ch, ch)].nnz == 0


def test_prove_milp_arm_closes_small(rng):
    """mwis_prove with a >= 600 s budget routes the remaining budget to
    the HiGHS MILP arm (round-4 portfolio; calibrated on the GEN21_test2
    hard tail where it closes instances the native B&B cannot). On a small
    instance either arm must return the brute-force optimum."""
    import numpy as np
    import scipy.sparse as sp
    from distgcn_tpu.solvers.exact import mwis_prove, mwis_milp

    n = 24
    a = (rng.random((n, n)) < 0.25)
    a = np.triu(a, 1)
    adj = sp.csr_matrix((a + a.T).astype(float))
    w = rng.random(n)
    sel, util, status = mwis_prove(adj, w, timeout=600.0)
    assert status == "Optimal"
    _, util_m, st_m = mwis_milp(adj, w, 60.0)
    assert st_m == "Optimal"
    assert abs(util - util_m) < 1e-8

"""Pallas fused-LGS kernel (ops/lgs_pallas) — interpret-mode parity tests."""

import numpy as np
import jax.numpy as jnp
import scipy.sparse as sp

from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.ops.lgs import batched_lgs, lgs_ranks
from distgcn_tpu.ops.lgs_pallas import batched_lgs_pallas
from distgcn_tpu.solvers.greedy import local_greedy_search

from conftest import random_graph


def test_lgs_ranks_total_order(rng):
    w = np.array([[0.5, 0.5, 0.9, 0.1, 0.5]], np.float32)
    r = np.asarray(lgs_ranks(jnp.asarray(w)))[0]
    # node 2 highest; ties at 0.5 broken by smaller id first
    assert r[2] == 5
    assert r[0] > r[1] > r[4]
    assert r[3] == 1
    assert sorted(r.tolist()) == [1, 2, 3, 4, 5]


def _case_batch(rng, b=4, n=50, pad=128):
    adjs = [random_graph(rng, n=n, p=0.12) for _ in range(b)]
    wtss = [rng.random(n) for _ in range(b)]
    return GraphBatch.from_scipy(adjs, wtss, pad_to=pad), adjs, wtss


def test_pallas_matches_xla_random(rng):
    gb, adjs, wtss = _case_batch(rng)
    adj8 = (gb.adj > 0).astype(jnp.int8)
    sel1, util1, rmax = batched_lgs(gb.adj, gb.wts, gb.mask)
    sel2, util2, rounds = batched_lgs_pallas(adj8, gb.wts, gb.mask,
                                             interpret=True)
    assert bool(jnp.all(sel1 == sel2))
    np.testing.assert_allclose(np.asarray(util1), np.asarray(util2),
                               rtol=1e-6)
    assert int(jnp.max(rounds)) == int(rmax)
    # and against the host reference solver
    sel2 = np.asarray(sel2)
    for i, (a, w) in enumerate(zip(adjs, wtss)):
        mwis, total = local_greedy_search(a, w)
        assert set(np.nonzero(sel2[i, :a.shape[0]] == 1)[0].tolist()) == mwis


def test_pallas_engineered_ties(rng):
    """Equal weights everywhere: tie-break by smaller node id."""
    n = 30
    a = random_graph(rng, n=n, p=0.2)
    w = np.ones(n)
    gb = GraphBatch.from_scipy([a], [w], pad_to=128)
    adj8 = (gb.adj > 0).astype(jnp.int8)
    sel, util, _ = batched_lgs_pallas(adj8, gb.wts, gb.mask, interpret=True)
    mwis, total = local_greedy_search(a, w)
    got = set(np.nonzero(np.asarray(sel)[0, :n] == 1)[0].tolist())
    assert got == mwis
    np.testing.assert_allclose(float(util[0]), total, rtol=1e-6)


def test_pallas_max_rounds_cap(rng):
    gb, adjs, _ = _case_batch(rng, b=2)
    adj8 = (gb.adj > 0).astype(jnp.int8)
    sel1, _, _ = batched_lgs(gb.adj, gb.wts, gb.mask, max_rounds=1)
    sel2, _, r = batched_lgs_pallas(adj8, gb.wts, gb.mask, max_rounds=1,
                                    interpret=True)
    assert bool(jnp.all(sel1 == sel2))
    assert int(jnp.max(r)) == 1


def test_pallas_rejects_unaligned_n(rng):
    gb, _, _ = _case_batch(rng, b=1, n=20, pad=None)
    # force an unaligned pad
    import pytest
    adj = jnp.zeros((1, 100, 100), jnp.int8)
    w = jnp.ones((1, 100))
    m = jnp.ones((1, 100), bool)
    with pytest.raises(ValueError):
        batched_lgs_pallas(adj, w, m, interpret=True)

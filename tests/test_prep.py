"""Graph preprocessing parity tests (vs the documented reference semantics
of gcn/utils.py and vs dense linear algebra)."""

import numpy as np
import scipy.sparse as sp
import pytest

from conftest import random_graph
from distgcn_tpu.core import prep
from distgcn_tpu.core.graph import GraphBatch


def dense_sym_norm(a):
    d = a.sum(1)
    with np.errstate(divide="ignore"):
        dis = np.power(d, -0.5)
    dis[np.isinf(dis)] = 0
    return a * dis[:, None] * dis[None, :]


def test_normalize_adj_matches_dense(rng):
    a = random_graph(rng, 50, 0.1)
    got = prep.normalize_adj(a).toarray()
    want = dense_sym_norm(a.toarray())
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_normalize_adj_isolated_nodes(rng):
    a = sp.csr_matrix((5, 5))  # empty graph
    got = prep.normalize_adj(a).toarray()
    np.testing.assert_array_equal(got, np.zeros((5, 5)))


def test_simple_polynomials(rng):
    a = random_graph(rng, 40, 0.1)
    polys = prep.simple_polynomials(a, 3)
    assert len(polys) == 4
    lap = np.eye(40) - dense_sym_norm(a.toarray())
    np.testing.assert_allclose(polys[0].toarray(), np.eye(40), atol=1e-12)
    np.testing.assert_allclose(polys[1].toarray(), lap, atol=1e-12)
    np.testing.assert_allclose(polys[2].toarray(), lap @ lap, atol=1e-10)
    np.testing.assert_allclose(polys[3].toarray(), lap @ lap @ lap, atol=1e-10)


def test_chebyshev_polynomials(rng):
    a = random_graph(rng, 30, 0.15)
    polys = prep.chebyshev_polynomials(a, 2)
    assert len(polys) == 3
    # T0 = I; T2 = 2 * Lhat @ T1 - T0
    np.testing.assert_allclose(polys[0].toarray(), np.eye(30), atol=1e-12)
    t2 = 2 * polys[1].toarray() @ polys[1].toarray() - np.eye(30)
    np.testing.assert_allclose(polys[2].toarray(), t2, atol=1e-8)


def test_preprocess_features_zero_rows():
    f = np.array([[1.0, 3.0], [0.0, 0.0], [2.0, 2.0]])
    got = prep.preprocess_features(f)
    np.testing.assert_allclose(got, [[0.25, 0.75], [0, 0], [0.5, 0.5]],
                               atol=1e-7)


def test_dense_polynomials_match_scipy_on_padded_batch(rng):
    import jax.numpy as jnp
    graphs = [random_graph(rng, n, 0.1) for n in (33, 47)]
    wts = [np.ones(g.shape[0]) for g in graphs]
    gb = GraphBatch.from_scipy(graphs, wts, bucket=64)
    supports = prep.simple_polynomials_dense(gb.adj, 2)   # [B, 3, N, N]
    assert supports.shape == (2, 3, 64, 64)
    for i, g in enumerate(graphs):
        n = g.shape[0]
        ref = prep.simple_polynomials(g, 2)
        for k in range(3):
            np.testing.assert_allclose(
                np.asarray(supports[i, k])[:n, :n], ref[k].toarray(),
                atol=1e-5)
        # real-block rows must not leak padding: columns beyond n are zero
        np.testing.assert_allclose(
            np.asarray(supports[i, 1])[:n, n:], 0.0, atol=0)

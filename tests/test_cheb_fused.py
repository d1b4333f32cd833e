"""Fused ChebGCN layer kernel (ops/cheb_fused.py) — interpret-mode parity.

Oracle: the reference layer semantics out = act(X@W0 + L@(X@W1) + b) with
L = I - normalize_adj(A) (gcn/layers.py:199-208, gcn/utils.py:258-274)
computed densely in float64. The fused kernel streams bf16 activations, so
tolerances are bf16-class; selection-level equality is covered by
tests/test_large.py (BSR vs ELL solve).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from distgcn_tpu.core import prep
from distgcn_tpu.ops.spmm import BsrMatrix, bsr_row_ptr
from distgcn_tpu.ops.cheb_fused import fused_forward
from distgcn_tpu.large import build_large_graph, large_gcn_forward


def _banded_graph(n=384, width=40, p=0.15, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(n):
        for j in range(i + 1, min(i + width, n)):
            if rng.random() < p:
                rows.append(i)
                cols.append(j)
    adj = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    return (adj + adj.T).tocsr()


def _params(dims, seed=1):
    rng = np.random.default_rng(seed)
    out, fin = [], dims[0]
    for fout in dims[1:]:
        out.append({
            "w_0": jnp.asarray(rng.normal(size=(fin, fout)) * 0.3,
                               jnp.float32),
            "w_1": jnp.asarray(rng.normal(size=(fin, fout)) * 0.3,
                               jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(fout,)) * 0.1, jnp.float32),
        })
        fin = fout
    return out


def _dense_oracle(adj, params, feats, final_leaky=False):
    n = adj.shape[0]
    L = np.eye(n) - np.asarray(prep.normalize_adj(adj).todense(), np.float64)
    h = feats.astype(np.float64)
    nl = len(params)
    for li, p in enumerate(params):
        out = (h @ np.asarray(p["w_0"], np.float64)
               + L @ (h @ np.asarray(p["w_1"], np.float64))
               + np.asarray(p["bias"], np.float64))
        if li < nl - 1 or final_leaky:
            out = np.where(out > 0, out, 0.2 * out)
        h = out
    return h


@pytest.mark.parametrize("final_leaky", [False, True])
def test_fused_forward_matches_dense_oracle(final_leaky):
    adj = _banded_graph()
    n = adj.shape[0]
    rng = np.random.default_rng(2)
    feats = rng.random((n, 1)).astype(np.float32)
    params = _params([1, 32, 32, 1])
    oracle = _dense_oracle(adj, params, feats, final_leaky)

    deg = np.asarray(adj.sum(1)).ravel()
    r = np.where(deg > 0, deg ** -0.5, 0.0).astype(np.float32).reshape(-1, 1)
    ind = adj.copy()
    ind.data[:] = 1.0
    b = BsrMatrix.from_scipy(ind, 128, dtype=np.int8)
    got = fused_forward(jnp.asarray(b.blk_vals), bsr_row_ptr(b),
                        jnp.asarray(b.blk_cols), jnp.asarray(r), params,
                        jnp.asarray(feats), b.n_rows, 128,
                        final_act_mode=1 if final_leaky else 0,
                        interpret=True)
    got = np.asarray(got)[:n]
    assert got.shape[1] == 1
    # bf16 activations: ~0.4% per-element input rounding compounded over 3
    # layers with random +/- weights (worst case for cancellation)
    err = np.abs(got - oracle) / (np.abs(oracle) + 1e-2)
    assert err.mean() < 0.02, err.mean()


def test_large_forward_fused_vs_exact_path():
    adj = _banded_graph(n=300)
    rng = np.random.default_rng(3)
    feats_n = rng.random((300, 1)).astype(np.float32)
    params = _params([1, 32, 1], seed=4)

    g = build_large_graph(adj, block_size=128, use_pallas=True,
                          interpret=True)
    assert g.separable and g.bsr is None     # no value blocks built
    feats = jnp.asarray(np.pad(feats_n, ((0, g.n_pad - 300), (0, 0))))
    out_f = large_gcn_forward(g, params, feats)             # fused default
    out_e = large_gcn_forward(g, params, feats, fused=False)  # int8 + r SpMM
    gx = build_large_graph(adj, block_size=128, use_pallas=True,
                           interpret=True, value_blocks=True)
    out_v = large_gcn_forward(gx, params, feats, fused=False)  # value blocks

    a, b_, c = (np.asarray(o)[:300, 0] for o in (out_f, out_e, out_v))
    assert np.allclose(b_, c, rtol=1e-5, atol=1e-6)   # both exact paths
    err = np.abs(a - c) / (np.abs(c) + 1e-2)
    assert err.mean() < 0.01, err.mean()


def test_weighted_adjacency_not_separable():
    adj = _banded_graph(n=200)
    adj = adj * 2.0     # non-binary weights
    g = build_large_graph(adj, block_size=128, use_pallas=True,
                          interpret=True)
    assert not g.separable and g.bsr is not None and g.r is None
    params = _params([1, 16, 1], seed=5)
    feats = jnp.asarray(np.random.default_rng(6)
                        .random((g.n_pad, 1)).astype(np.float32))
    out = large_gcn_forward(g, params, feats)   # auto-falls back
    oracle = _dense_oracle(adj, params, np.asarray(feats)[:200])
    err = np.abs(np.asarray(out)[:200, 0] - oracle[:, 0])
    assert err.max() < 1e-3

"""Large-graph BSR/ELL SpMM (ops/spmm) — interpret-mode + oracle tests."""

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from distgcn_tpu.ops.spmm import (BsrMatrix, SparseSupport, bsr_row_ptr,
                                  bsr_spmm_pallas, bsr_spmm_rows, ell_pack,
                                  ell_spmm)


def _banded(rng, n=1024, deg=8, bw=96):
    nnz = n * deg
    rows = rng.integers(0, n, nnz)
    offs = rng.integers(1, bw, nnz)
    cols = (rows + offs * rng.choice([-1, 1], nnz)) % n
    s = sp.coo_matrix((np.ones(nnz, np.float32), (rows, cols)),
                      shape=(n, n)).tocsr()
    s = s + s.T + sp.eye(n, format="csr")
    s.data[:] = rng.random(s.nnz).astype(np.float32)
    return s


def test_bsr_roundtrip_blocks(rng):
    s = _banded(rng, n=512)
    bsr = BsrMatrix.from_scipy(s, 128)
    # reassemble dense from the real (pre-padding) blocks
    dense = np.zeros((bsr.n_rows, bsr.n_cols), np.float32)
    for b in range(bsr.nb_real):
        r, c = int(bsr.blk_rows[b]), int(bsr.blk_cols[b])
        dense[r * 128:(r + 1) * 128, c * 128:(c + 1) * 128] = \
            np.asarray(bsr.blk_vals[b])
    np.testing.assert_allclose(dense[:512, :512], s.toarray(), rtol=1e-6)
    # blk_rows nondecreasing (kernel contract); padding blocks all-zero
    br = np.asarray(bsr.blk_rows)
    assert np.all(np.diff(br) >= 0)
    assert not np.asarray(bsr.blk_vals[bsr.nb_real:]).any()


def test_bsr_spmm_block_grid_matches_scipy(rng):
    s = _banded(rng)
    x = rng.random((s.shape[0], 128)).astype(np.float32)
    bsr = BsrMatrix.from_scipy(s, 128)
    y = np.asarray(bsr_spmm_pallas(bsr, jnp.asarray(x),
                                   interpret=True)[: s.shape[0]])
    np.testing.assert_allclose(y, s @ x, rtol=2e-5, atol=1e-5)


def test_bsr_spmm_rows_matches_scipy_and_handles_empty_rows(rng):
    s = _banded(rng)
    # zero out a whole block-row worth of rows (empty block-row case)
    s = s.tolil()
    s[256:384, :] = 0
    s[:, 256:384] = 0
    s = s.tocsr()
    s.eliminate_zeros()
    x = rng.random((s.shape[0], 128)).astype(np.float32)
    bsr = BsrMatrix.from_scipy(s, 128)
    rp = bsr_row_ptr(bsr)
    y = np.asarray(bsr_spmm_rows(bsr, jnp.asarray(x), rp,
                                 interpret=True)[: s.shape[0]])
    np.testing.assert_allclose(y, s @ x, rtol=2e-5, atol=1e-5)
    assert np.all(y[256:384] == 0)


def test_bsr_neighbor_max_rectangular(rng):
    # bsr_neighbor_max on a non-square pattern (n_rows != n_cols): the
    # kernel input is laid out [1, n_cols], not [1, n_rows]
    from distgcn_tpu.ops.spmm import bsr_neighbor_max, _NEG_HUGE
    n, m = 256, 512
    s = sp.random(n, m, density=0.02, random_state=7, format="csr",
                  dtype=np.float32)
    s.data[:] = 1.0
    x = rng.random(m).astype(np.float32)
    bsr = BsrMatrix.from_scipy(s, 128)
    y = np.asarray(bsr_neighbor_max(bsr, jnp.asarray(x),
                                    interpret=True))[:n]
    dense = s.toarray() != 0
    expect = np.where(dense.any(axis=1),
                      np.where(dense, x[None, :], _NEG_HUGE).max(axis=1),
                      y)  # no-neighbor rows: sentinel/uninit, not asserted
    np.testing.assert_allclose(np.where(dense.any(axis=1), y, 0.0),
                               np.where(dense.any(axis=1), expect, 0.0),
                               rtol=1e-6)


def test_ell_matches_scipy(rng):
    s = _banded(rng, n=300)
    x = rng.random((300, 16)).astype(np.float32)
    cols, vals = ell_pack(s)
    y = np.asarray(ell_spmm(jnp.asarray(cols), jnp.asarray(vals),
                            jnp.asarray(x)))
    np.testing.assert_allclose(y, s @ x, rtol=2e-5, atol=1e-5)


def test_sparse_support_dispatch(rng):
    s = _banded(rng, n=300)
    x = rng.random((300, 16)).astype(np.float32)
    sup = SparseSupport(s)
    assert not sup.use_pallas  # CPU backend in tests
    y = np.asarray(sup @ jnp.asarray(x))
    np.testing.assert_allclose(y, s @ x, rtol=2e-5, atol=1e-5)

"""Panel-grid neighbor-max (ops/spmm.bsr_panels + _bsr_nbr_max_panels).

Oracle: dense neighbor-max (heuristics.py:77-116's per-round reduction);
equality with the resident chunk kernel's dispatch is covered via a forced
panel-path LGS solve against `ell_lgs`.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from distgcn_tpu.ops import spmm as S


def _banded(n, width, p, seed=0):
    rng = np.random.default_rng(seed)
    rows, cols = [], []
    for i in range(n):
        for j in range(i + 1, min(i + width, n)):
            if rng.random() < p:
                rows.append(i)
                cols.append(j)
    adj = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    return (adj + adj.T).tocsr()


@pytest.mark.parametrize("n,width,panel_rows", [(1024, 200, 2), (640, 64, 3)])
def test_panel_nbr_max_matches_dense(n, width, panel_rows):
    adj = _banded(n, width, 0.2)
    pans = S.bsr_panels(adj, block_size=128, panel_rows=panel_rows,
                        dtype=np.int8)
    b = pans.bsr
    # panel alignment invariants
    ptr = np.asarray(pans.panel_ptr)
    assert b.num_blocks % S._CHUNK == 0 and ptr[-1] * S._CHUNK == b.num_blocks
    rows = np.asarray(b.blk_rows)
    assert (np.diff(rows) >= 0).all()
    for p in range(pans.n_panels):
        sl = rows[ptr[p] * S._CHUNK: ptr[p + 1] * S._CHUNK]
        assert (sl // panel_rows == p).all()
        ws = int(np.asarray(pans.win_start)[p])
        cl = np.asarray(b.blk_cols)[ptr[p] * S._CHUNK: ptr[p + 1] * S._CHUNK]
        assert ((cl >= ws) & (cl < ws + pans.win_blocks)).all()

    rng = np.random.default_rng(1)
    x = rng.random(b.n_cols).astype(np.float32)
    got = S._bsr_nbr_max_panels(
        b.blk_vals, pans.panel_ptr, pans.win_start, b.blk_rows, b.blk_cols,
        jnp.asarray(x), b.n_rows, 128, pans.panel_rows, pans.win_blocks,
        pans.n_panels, interpret=True)
    dense = adj.toarray() != 0
    oracle = np.where(dense, x[None, :n], -np.inf).max(1)
    has = dense.any(1)
    np.testing.assert_allclose(np.asarray(got)[:n][has], oracle[has])
    assert (np.asarray(got)[:n][~has] <= S._NEG_HUGE).all()


def test_bsr_lgs_panel_path_matches_ell(monkeypatch):
    from distgcn_tpu import large as L
    from distgcn_tpu.ops.lgs import ell_lgs

    adj = _banded(700, 80, 0.25, seed=3)
    g = L.build_large_graph(adj, block_size=128, use_pallas=True,
                            interpret=True)
    # force the panel path (tests are small enough for the chunk kernel)
    monkeypatch.setattr(S, "_nbr_max_fits_vmem",
                        lambda *a, **k: False)
    assert S._nbr_max_panels_fit_vmem(
        g.panels.panel_rows, 128, g.panels.win_blocks, 1)
    arrs = L.graph_arrays(g)
    rng = np.random.default_rng(4)
    w = np.zeros(g.n_pad, np.float32)
    w[:700] = rng.random(700)
    sel, util, rounds = L.bsr_lgs(g, arrs, jnp.asarray(w), g.mask)
    sel_e, util_e, _ = ell_lgs(arrs["ell_cols"], arrs["ell_valid"],
                               jnp.asarray(w), g.mask)
    assert np.array_equal(np.asarray(sel), np.asarray(sel_e))
    assert np.isclose(float(util), float(util_e))

"""Large-graph pipeline: sparse LGS + BSR/ELL GCN forward parity vs host.

Oracles: `solvers.greedy.local_greedy_search` (host LGS spec re-derivation,
tested against reference dataset fields elsewhere) and a float64 numpy
forward of the reference layer math (gcn/layers.py:199-208).
"""

import numpy as np
import scipy.sparse as sp
import pytest

import jax
import jax.numpy as jnp

from distgcn_tpu.core import prep
from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.large import (LargeGraph, build_large_graph,
                               geometric_conflict_graph, large_gcn_forward,
                               make_large_solve, params_to_list)
from distgcn_tpu.models.gcn import ChebGCN
from distgcn_tpu.ops.lgs import ell_lgs
from distgcn_tpu.ops.spmm import ell_pack
from distgcn_tpu.solvers.greedy import local_greedy_search


def _ell_of_adjacency(adj, n_pad):
    cols, vals = ell_pack(sp.csr_matrix(adj))
    k = cols.shape[1]
    cols_p = np.tile(np.arange(n_pad, dtype=np.int32)[:, None], (1, k))
    vals_p = np.zeros((n_pad, k), np.float32)
    cols_p[: adj.shape[0]] = cols
    vals_p[: adj.shape[0]] = vals
    mask = np.zeros(n_pad, bool)
    mask[: adj.shape[0]] = True
    return (jnp.asarray(cols_p), jnp.asarray(vals_p != 0), jnp.asarray(mask))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ell_lgs_matches_host_lgs(seed):
    rng = np.random.default_rng(seed)
    n = 300
    a = (rng.random((n, n)) < 0.03).astype(np.float32)
    a = np.triu(a, 1)
    a = sp.csr_matrix(a + a.T)
    w = rng.random(n)
    cols, valid, mask = _ell_of_adjacency(a, 384)
    wts = np.zeros(384, np.float32)
    wts[:n] = w
    sel, util, rounds = ell_lgs(cols, valid, jnp.asarray(wts), mask)
    ref_set, ref_util = local_greedy_search(a, w)
    got = set(np.nonzero(np.asarray(sel) == 1)[0].tolist())
    assert got == ref_set
    assert np.isclose(float(util), ref_util, rtol=1e-6)


def test_ell_lgs_engineered_ties():
    # all-equal weights on a path graph: tie-break by smaller id
    n = 6
    a = sp.csr_matrix(sp.diags([1.0, 1.0], [1, -1], shape=(n, n)))
    w = np.ones(n)
    cols, valid, mask = _ell_of_adjacency(a, 8)
    wts = np.zeros(8, np.float32)
    wts[:n] = w
    sel, util, _ = ell_lgs(cols, valid, jnp.asarray(wts), mask)
    ref_set, ref_util = local_greedy_search(a, w)
    assert set(np.nonzero(np.asarray(sel) == 1)[0].tolist()) == ref_set
    assert np.isclose(float(util), ref_util)


def _host_forward(params_list, adj, x, max_degree=1, final_linear=True):
    """float64 reference math: out = sum_k L^k @ (h @ w_k)."""
    sups = prep.simple_polynomials(adj, max_degree)
    h = np.asarray(x, np.float64)
    nl = len(params_list)
    for li, layer in enumerate(params_list):
        out = sum(np.asarray(sups[k].todense()) @
                  (h @ np.asarray(layer[f"w_{k}"], np.float64))
                  for k in range(max_degree + 1))
        if "bias" in layer:
            out = out + np.asarray(layer["bias"], np.float64)
        if li < nl - 1 or not final_linear:
            out = np.where(out > 0, out, 0.2 * out)
        h = out
    return h


@pytest.mark.parametrize("num_layer,max_degree", [(1, 1), (3, 1), (2, 2)])
def test_large_forward_matches_host(num_layer, max_degree):
    adj, wts, _ = geometric_conflict_graph(500, avg_degree=12.0, seed=3)
    g = build_large_graph(adj, block_size=128, use_pallas=False)
    model = ChebGCN(num_layer=num_layer, hidden_dim=16, out_dim=1,
                    num_supports=max_degree + 1)
    feats = np.ones((g.n_pad, 1), np.float32) * np.asarray(g.mask)[:, None]
    sups = jnp.zeros((1, max_degree + 1, 8, 8))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 1)), sups)["params"]
    plist = params_to_list(params)
    out = large_gcn_forward(g, plist, jnp.asarray(feats),
                            max_degree=max_degree)
    ref = _host_forward(plist, adj, feats[: g.n], max_degree)
    np.testing.assert_allclose(np.asarray(out)[: g.n], ref, atol=2e-4)


def test_large_solve_matches_dense_pipeline():
    """End-to-end large path == dense batched pipeline on the same graph."""
    from distgcn_tpu.pipeline import make_solve_pipeline
    from distgcn_tpu.utils.config import Config

    adj, wts, _ = geometric_conflict_graph(400, avg_degree=10.0, seed=7)
    cfg = Config(feature_size=1, hidden1=16, num_layer=3, diver_num=1,
                 max_degree=1, predict="mwis", pad_to=512)
    model = ChebGCN(num_layer=3, hidden_dim=16, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 1)),
                        jnp.zeros((1, 2, 8, 8)))["params"]

    gb = GraphBatch.from_scipy([adj], [wts], pad_to=512)
    dense = make_solve_pipeline(model, cfg)
    dsel, dutil, dgutil = dense(params, gb.adj, gb.wts, gb.mask)

    g = build_large_graph(adj, block_size=128, use_pallas=False)
    solve = make_large_solve(g, feature_size=1, max_degree=1,
                             with_baseline=True)
    wpad = np.zeros(g.n_pad, np.float32)
    wpad[: g.n] = wts
    lsel, lutil, lgutil = solve(params_to_list(params), jnp.asarray(wpad))

    assert np.array_equal(np.asarray(dsel)[0, : g.n],
                          np.asarray(lsel)[: g.n])
    assert np.isclose(float(dutil[0]), float(lutil), rtol=1e-5)
    assert np.isclose(float(dgutil[0]), float(lgutil), rtol=1e-5)


def test_bsr_neighbor_max_matches_ell(rng=None):
    """Pallas BSR neighbor-max (interpret) == gather formulation, incl.
    no-neighbor sentinel rows and empty block-rows."""
    from distgcn_tpu.ops.spmm import BsrMatrix, bsr_neighbor_max
    rng = np.random.default_rng(5)
    n = 300
    a = (rng.random((n, n)) < 0.02).astype(np.float32)
    a = np.triu(a, 1)
    a[0, :] = a[:, 0] = 0.0          # isolated node
    a = sp.csr_matrix(a + a.T)
    bsr = BsrMatrix.from_scipy(a, 128)
    x = rng.standard_normal(n).astype(np.float32)
    got = np.asarray(bsr_neighbor_max(bsr, jnp.asarray(x), interpret=True))
    dense = a.toarray()
    for i in range(n):
        nbrs = np.nonzero(dense[i])[0]
        if nbrs.size:
            assert np.isclose(got[i], x[nbrs].max()), i
        else:
            assert got[i] < -1e38
    # padding rows (beyond n) also initialized
    assert (got[n:] < -1e38).all()


def test_bsr_lgs_interpret_matches_host():
    from distgcn_tpu.large import bsr_lgs, graph_arrays
    adj, wts, _ = geometric_conflict_graph(300, avg_degree=8.0, seed=13)
    g = build_large_graph(adj, block_size=128, use_pallas=True,
                          interpret=True)
    arrs = graph_arrays(g)
    wpad = np.zeros(g.n_pad, np.float32)
    wpad[: g.n] = wts
    sel, util, rounds = jax.jit(
        lambda a, w, m: bsr_lgs(g, a, w, m))(arrs, jnp.asarray(wpad),
                                             g.mask)
    ref_set, ref_util = local_greedy_search(adj, wts)
    assert set(np.nonzero(np.asarray(sel) == 1)[0].tolist()) == ref_set
    assert np.isclose(float(util), ref_util, rtol=1e-6)


def test_large_closed_loop_runs_and_drains():
    """City-scale closed loop: queues stay bounded at moderate load and the
    scheduler picks independent sets every slot."""
    from distgcn_tpu.large import make_large_closed_loop
    adj, wts, _ = geometric_conflict_graph(300, avg_degree=6.0, seed=31)
    g = build_large_graph(adj, block_size=128, use_pallas=False)
    model = ChebGCN(num_layer=2, hidden_dim=8, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 8, 1)),
                        jnp.zeros((1, 2, 8, 8)))["params"]
    run = make_large_closed_loop(g, timeslots=40, load=0.5)
    q0 = jnp.zeros(g.n_pad)
    qT, metrics = run(params_to_list(params), q0, jax.random.PRNGKey(0))
    assert float(metrics["avg_utility"]) > 0
    assert 0 < float(metrics["sched_rate"]) < 1
    # padding never accumulates queue
    assert not np.asarray(qT)[g.n:].any()
    # low-load queues should stay small relative to arrival volume
    assert float(metrics["avg_queue_len"]) < 40 * 25.0


def test_large_solve_bsr_interpret_matches_ell():
    """The Pallas BSR route (interpret mode) equals the ELL route."""
    adj, wts, _ = geometric_conflict_graph(256, avg_degree=8.0, seed=11)
    model = ChebGCN(num_layer=2, hidden_dim=8, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 8, 1)),
                        jnp.zeros((1, 2, 8, 8)))["params"]
    plist = params_to_list(params)
    wpad = jnp.asarray(np.pad(wts, (0, 0)).astype(np.float32))

    g_ell = build_large_graph(adj, block_size=128, use_pallas=False)
    g_bsr = build_large_graph(adj, block_size=128, use_pallas=True,
                              interpret=True)
    s1 = make_large_solve(g_ell)(plist, wpad)
    s2 = make_large_solve(g_bsr)(plist, wpad)
    assert np.array_equal(np.asarray(s1[0]), np.asarray(s2[0]))
    assert np.isclose(float(s1[1]), float(s2[1]), rtol=1e-5)


def test_bit_pack_auto_fallback_when_no_kernel_fits(monkeypatch):
    """ADVICE r4 #3: auto bit_pack must fall back to int8 (warning, not a
    solve-time ValueError) when neither the chunk- nor panel-grid kernel
    fits VMEM — forced here by shrinking the budget."""
    import warnings
    from distgcn_tpu.ops import spmm as spmm_mod
    from distgcn_tpu.large import build_large_graph

    rng = np.random.default_rng(0)
    n = 4096
    rows = rng.integers(0, n, 40000)
    cols = rng.integers(0, n, 40000)
    m = rows != cols
    a = sp.coo_matrix((np.ones(m.sum(), np.float32),
                       (rows[m], cols[m])), shape=(n, n))
    a = ((a + a.T) != 0).astype(np.float32).tocsr()
    monkeypatch.setattr(spmm_mod, "_VMEM_BUDGET", 64 * 1024)
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter("always")
        g = build_large_graph(a, block_size=512, use_pallas=True)
    assert g.bitmap is False
    assert g.ind_bsr.blk_vals.dtype == np.int8
    assert any("falling back" in str(w.message) for w in wlist)
    # explicit bit_pack=True is the caller's choice: no silent downgrade
    g2 = build_large_graph(a, block_size=512, use_pallas=True,
                           bit_pack=True)
    assert g2.bitmap is True


def test_serpentine_order_scale_invariant_blocks():
    """serpentine_order: valid permutation; touched-block count per edge
    stays ~flat across scales and beats RCM at the larger one (the r5
    ordering claim, RESULTS.md)."""
    from distgcn_tpu.large import geometric_conflict_graph, serpentine_order

    counts = {}
    for n in (8192, 32768):
        adj, _, xy = geometric_conflict_graph(n, avg_degree=24.0, seed=3,
                                              order="grid")
        perm = serpentine_order(xy, tile=256)
        assert sorted(perm.tolist()) == list(range(len(perm)))
        coo = adj.tocoo()
        bs = 256
        blk = (coo.row // bs).astype(np.int64) * (-(-n // bs)) \
            + coo.col // bs
        counts[n] = len(np.unique(blk)) * bs * bs / adj.nnz
    # scale-invariance: area/edge within 25% across a 4x size step
    assert abs(counts[32768] - counts[8192]) / counts[8192] < 0.25, counts


def test_gather_window_fused_matches_contiguous_panels():
    """The gather-window fused layer (r5, ops.spmm.panel_gather_meta +
    cheb_fused._fused_cheb_layer_gwin) must be bit-equal to the contiguous
    panel kernel — same blocks, same math, only the x/r window layout
    differs."""
    import jax.numpy as jnp
    from distgcn_tpu.large import (geometric_conflict_graph,
                                   large_gcn_forward, graph_arrays)

    adj, _, _ = geometric_conflict_graph(1500, avg_degree=10.0, seed=5)
    g = build_large_graph(adj, block_size=128, use_pallas=True,
                          interpret=True, ind_block_size=128)
    assert g.bitmap and g.gather is not None
    plist = [{"w_0": jnp.full((1, 4), 0.3), "w_1": jnp.full((1, 4), 0.7)},
             {"w_0": jnp.full((4, 1), 0.2), "w_1": jnp.full((4, 1), 0.4)}]
    x = jnp.ones((g.n_pad, 1))
    out_g = np.asarray(large_gcn_forward(g, plist, x), np.float32)
    g.gather = None          # force the contiguous panel kernel
    out_p = np.asarray(large_gcn_forward(g, plist, x,
                                         arrs=graph_arrays(g)), np.float32)
    np.testing.assert_array_equal(out_g, out_p)


def test_unaligned_n_keeps_bitmap_panels_bounded_window():
    """Review r5 #1: an n whose padding creates EMPTY ind block-rows must
    not degenerate the panel window (placeholders now sit on the diagonal,
    inside the own-row window) nor silently lose the bitmap path."""
    adj, _, _ = geometric_conflict_graph(33000, avg_degree=10.0, seed=9)
    g = build_large_graph(adj, block_size=512, use_pallas=True,
                          interpret=True)
    nc_b = g.n_pad // g.ind_bsr.block_size
    assert g.bitmap, "bitmap path lost on unaligned n"
    assert g.panels.win_blocks < nc_b, \
        (g.panels.win_blocks, nc_b, "window degenerated to full width")
    # estimator must agree with the built panels
    import scipy.sparse as sp
    ind = sp.csr_matrix(adj)
    ind.data[:] = 1.0
    ind.resize(g.n_pad, g.n_pad)
    from distgcn_tpu.ops.spmm import panel_window_width
    est = panel_window_width(ind, g.ind_bsr.block_size,
                             g.panels.panel_rows)
    assert est == g.panels.win_blocks, (est, g.panels.win_blocks)

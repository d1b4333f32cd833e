"""Sharded giant-graph solve (int8 structure panels + ring) vs single-chip."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from distgcn_tpu.large import (build_large_graph, geometric_conflict_graph,
                               make_large_solve, params_to_list)
from distgcn_tpu.models.gcn import ChebGCN
from distgcn_tpu.parallel.large_sharded import (make_sharded_large_solve,
                                                shard_arrays,
                                                shard_large_graph)
from distgcn_tpu.solvers.greedy import local_greedy_search


@pytest.fixture
def mesh8():
    devs = jax.devices()
    assert len(devs) >= 8
    return Mesh(np.asarray(devs[:8]), ("graph",))


def _run_sharded(mesh8, sg, plist, wts):
    solve = make_sharded_large_solve(mesh8, sg)
    a1, a2, a3, a4, mask = shard_arrays(mesh8, sg)
    wpad = np.zeros(sg.n_pad, np.float32)
    wpad[: sg.n] = wts
    wsh = jax.device_put(jnp.asarray(wpad), NamedSharding(mesh8, P("graph")))
    sel, util = solve(a1, a2, a3, a4, plist, wsh, mask)
    return np.asarray(sel)[: sg.n], float(np.asarray(util)[0])


def test_sharded_large_solve_matches_single_chip(mesh8):
    adj, wts, _ = geometric_conflict_graph(400, avg_degree=10.0, seed=21)
    model = ChebGCN(num_layer=3, hidden_dim=16, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 1)),
                        jnp.zeros((1, 2, 8, 8)))["params"]
    plist = params_to_list(params)

    sg = shard_large_graph(adj, 8, block_size=8, interpret=True)
    assert sg.separable and sg.vals is None and sg.r is not None
    sel, util = _run_sharded(mesh8, sg, plist, wts)

    g1 = build_large_graph(adj, block_size=128, use_pallas=False)
    s1 = make_large_solve(g1)
    w1 = np.zeros(g1.n_pad, np.float32)
    w1[: g1.n] = wts
    sel1, util1, _ = s1(plist, jnp.asarray(w1))
    assert np.array_equal(sel, np.asarray(sel1)[: sg.n])
    assert np.isclose(util, float(util1), rtol=1e-5)


def test_sharded_matches_single_chip_fused_panels(mesh8):
    """The sharded separable formulation (int8 panels + r scalings over the
    ring) ties the single-chip FUSED kernel path (ops/cheb_fused.py) —
    selections equal, utility close (fused path streams bf16 activations)."""
    adj, wts, _ = geometric_conflict_graph(512, avg_degree=12.0, seed=31)
    model = ChebGCN(num_layer=2, hidden_dim=16, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 8, 1)),
                        jnp.zeros((1, 2, 8, 8)))["params"]
    plist = params_to_list(params)

    sg = shard_large_graph(adj, 8, block_size=8, interpret=True)
    sel, util = _run_sharded(mesh8, sg, plist, wts)

    gf = build_large_graph(adj, block_size=128, use_pallas=True,
                           interpret=True, ind_block_size=128)
    assert gf.separable
    sf = make_large_solve(gf)
    wf = np.zeros(gf.n_pad, np.float32)
    wf[: gf.n] = wts
    self_, utilf, _ = sf(plist, jnp.asarray(wf))
    assert np.array_equal(sel, np.asarray(self_)[: sg.n])
    assert np.isclose(util, float(utilf), rtol=1e-3)


def test_sharded_bitmap_panels_match_int8(mesh8):
    """block_size % 32 == 0 packs the panels bitmap (1 bit/cell); results
    must be bit-equal to the int8 panel stream (same 0/1 operand)."""
    adj, wts, _ = geometric_conflict_graph(700, avg_degree=9.0, seed=61)
    plist = [{"w_0": jnp.full((1, 1), 0.3), "w_1": jnp.full((1, 1), 0.9),
              "bias": jnp.full((1,), 0.05)}]
    sg_b = shard_large_graph(adj, 8, block_size=32, interpret=True)
    assert sg_b.bitmap and sg_b.ind.dtype == np.int32
    sel_b, util_b = _run_sharded(mesh8, sg_b, plist, wts)

    sg_8 = shard_large_graph(adj, 8, block_size=8, interpret=True)
    assert not sg_8.bitmap
    sel_8, util_8 = _run_sharded(mesh8, sg_8, plist, wts)
    assert np.array_equal(sel_b, sel_8)
    assert np.isclose(util_b, util_8, rtol=1e-6)
    # bitmap block stream is 8x lighter in the accounting
    assert sg_b.bytes_per_edge(adj.nnz, f=0) < sg_b.nnz_blocks * 32 * 32 \
        / adj.nnz


def test_sharded_value_panel_fallback_weighted_adj(mesh8):
    """Non-0/1 adjacency: normalization is not separable, so the sharded
    path falls back to value panels and still matches the ELL path."""
    adj, wts, _ = geometric_conflict_graph(300, avg_degree=8.0, seed=41)
    rng = np.random.default_rng(7)
    a = sp.triu(sp.csr_matrix(adj), 1).tocoo()
    a.data = rng.uniform(0.5, 2.0, a.nnz).astype(np.float32)
    adj_w = (a + a.T).tocsr()
    plist = [{"w_0": jnp.full((1, 1), 0.4), "w_1": jnp.full((1, 1), 0.7),
              "bias": jnp.full((1,), 0.2)}]

    sg = shard_large_graph(adj_w, 8, block_size=8, interpret=True)
    assert not sg.separable and sg.vals is not None
    sel, util = _run_sharded(mesh8, sg, plist, wts)

    g1 = build_large_graph(adj_w, block_size=128, use_pallas=False)
    s1 = make_large_solve(g1)
    w1 = np.zeros(g1.n_pad, np.float32)
    w1[: g1.n] = wts
    sel1, util1, _ = s1(plist, jnp.asarray(w1))
    assert np.array_equal(sel, np.asarray(sel1)[: sg.n])
    assert np.isclose(util, float(util1), rtol=1e-5)


def test_sharded_large_plain_lgs_matches_host(mesh8):
    """Zero GCN head => scores 0 ... predict='mwis' multiplies, so use an
    identity-score trick: single-layer zero-weight model makes gcn_wts all
    zero; instead check the plain-LGS equivalence by feeding weights
    through a model whose output is constant 1 (bias-only)."""
    adj, wts, _ = geometric_conflict_graph(300, avg_degree=8.0, seed=22)
    # 1-layer model with zero kernels and bias 1.0 -> act == 1 on real nodes
    plist = [{"w_0": jnp.zeros((1, 1)), "w_1": jnp.zeros((1, 1)),
              "bias": jnp.ones((1,))}]
    sg = shard_large_graph(adj, 8, block_size=8, interpret=True)
    sel, util = _run_sharded(mesh8, sg, plist, wts)
    ref_set, ref_util = local_greedy_search(adj, wts)
    got = set(np.nonzero(sel == 1)[0].tolist())
    assert got == ref_set
    assert np.isclose(util, ref_util, rtol=1e-5)


def test_sharded_bytes_per_edge_accounting():
    """The separable panel stream's per-edge traffic accounting: int8
    blocks dominate and land ~4x under an equivalent f32 value stream."""
    adj, _, _ = geometric_conflict_graph(2048, avg_degree=16.0, seed=51)
    sg = shard_large_graph(adj, 4, block_size=64, interpret=True)
    bpe = sg.bytes_per_edge(adj.nnz, f=0)    # f=0: isolate the block stream
    sgv = shard_large_graph(adj, 4, block_size=64, interpret=True,
                            value_blocks=True)
    sgv.separable = False
    # bitmap separable stream (1 bit/cell) vs f32 value panels = 32x
    assert sg.bitmap
    assert sgv.bytes_per_edge(adj.nnz, f=0) == 32 * bpe

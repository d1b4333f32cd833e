"""Sharded giant-graph solve (BSR panels + ring) vs the single-chip path."""

import numpy as np
import pytest

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


def test_sharded_large_solve_matches_single_chip(mesh8):
    adj, wts, _ = geometric_conflict_graph(400, avg_degree=10.0, seed=21)
    model = ChebGCN(num_layer=3, hidden_dim=16, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 1)),
                        jnp.zeros((1, 2, 8, 8)))["params"]
    plist = params_to_list(params)

    sg = shard_large_graph(adj, 8, block_size=8, interpret=True)
    solve = make_sharded_large_solve(mesh8, sg)
    vals, rptr, cols, ind, mask = shard_arrays(mesh8, sg)
    wpad = np.zeros(sg.n_pad, np.float32)
    wpad[: sg.n] = wts
    wsh = jax.device_put(jnp.asarray(wpad), NamedSharding(mesh8, P("graph")))
    sel, util = solve(vals, rptr, cols, ind, plist, wsh, mask)
    sel = np.asarray(sel)[: sg.n]

    g1 = build_large_graph(adj, block_size=128, use_pallas=False)
    s1 = make_large_solve(g1)
    w1 = np.zeros(g1.n_pad, np.float32)
    w1[: g1.n] = wts
    sel1, util1, _ = s1(plist, jnp.asarray(w1))
    assert np.array_equal(sel, np.asarray(sel1)[: sg.n])
    assert np.isclose(float(np.asarray(util)[0]), float(util1), rtol=1e-5)


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
    solve = make_sharded_large_solve(mesh8, sg)
    vals, rptr, cols, ind, mask = shard_arrays(mesh8, sg)
    wpad = np.zeros(sg.n_pad, np.float32)
    wpad[: sg.n] = wts
    wsh = jax.device_put(jnp.asarray(wpad), NamedSharding(mesh8, P("graph")))
    sel, util = solve(vals, rptr, cols, ind, plist, wsh, mask)
    ref_set, ref_util = local_greedy_search(adj, wts)
    got = set(np.nonzero(np.asarray(sel)[: sg.n] == 1)[0].tolist())
    assert got == ref_set
    assert np.isclose(float(np.asarray(util)[0]), ref_util, rtol=1e-5)

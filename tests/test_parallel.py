"""Multi-device sharding tests (8 virtual CPU devices from conftest)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from conftest import random_graph
from distgcn_tpu.core import prep
from distgcn_tpu.parallel.halo import (make_ring_spmm,
                                       make_sharded_gcn_forward,
                                       make_sharded_lgs)
from distgcn_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()[:8]), ("graph",))


def test_ring_spmm_matches_dense(mesh8, rng):
    n, f, d = 256, 64, 8
    a = rng.random((n, n)) < 0.05
    a = np.triu(a, 1)
    a = (a + a.T).astype(np.float32)
    s = np.eye(n, dtype=np.float32) - a * 0.1
    x = rng.random((n, f)).astype(np.float32)
    want = s @ x
    spmm = make_ring_spmm(mesh8, n, f)
    with mesh8:
        sh = NamedSharding(mesh8, P("graph", None))
        y = spmm(jax.device_put(s, sh), jax.device_put(x, sh))
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-3)


def test_sharded_gcn_forward_matches_host(mesh8, rng):
    import scipy.sparse as sp
    n, d = 128, 8
    a_sp = random_graph(rng, n, 0.08)
    adj = a_sp.toarray().astype(np.float32)
    deg = adj.sum(1)
    dis = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-30)), 0.0) \
        .astype(np.float32)
    params = [
        {"w_0": rng.standard_normal((1, 8)).astype(np.float32),
         "w_1": rng.standard_normal((1, 8)).astype(np.float32)},
        {"w_0": rng.standard_normal((8, 1)).astype(np.float32),
         "w_1": rng.standard_normal((8, 1)).astype(np.float32)},
    ]
    x = np.ones((n, 1), np.float32)
    fwd = make_sharded_gcn_forward(mesh8, n, 1, params)
    with mesh8:
        sh = NamedSharding(mesh8, P("graph", None))
        rep = NamedSharding(mesh8, P())
        y = fwd(jax.device_put(adj, sh), jax.device_put(dis, rep),
                jax.device_put(x, sh))
    # host oracle
    sup = prep.simple_polynomials(a_sp, 1)
    h = x
    for li, layer in enumerate(params):
        out = sup[0] @ (h @ layer["w_0"]) + sup[1] @ (h @ layer["w_1"])
        if li < len(params) - 1:
            out = np.where(out > 0, out, 0.2 * out)
        h = out.astype(np.float32)
    np.testing.assert_allclose(np.asarray(y), h, atol=2e-3)


def test_sharded_gcn_forward_cheb2_matches_host(mesh8, rng):
    """K=2 supports (cheb2 zoo family) through the ring forward."""
    n = 128
    a_sp = random_graph(rng, n, 0.08)
    adj = a_sp.toarray().astype(np.float32)
    deg = adj.sum(1)
    dis = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-30)), 0.0) \
        .astype(np.float32)
    params = [
        {"w_0": rng.standard_normal((1, 8)).astype(np.float32),
         "w_1": rng.standard_normal((1, 8)).astype(np.float32),
         "w_2": rng.standard_normal((1, 8)).astype(np.float32)},
        {"w_0": rng.standard_normal((8, 1)).astype(np.float32),
         "w_1": rng.standard_normal((8, 1)).astype(np.float32),
         "w_2": rng.standard_normal((8, 1)).astype(np.float32)},
    ]
    x = np.ones((n, 1), np.float32)
    fwd = make_sharded_gcn_forward(mesh8, n, 1, params, max_degree=2)
    with mesh8:
        sh = NamedSharding(mesh8, P("graph", None))
        rep = NamedSharding(mesh8, P())
        y = fwd(jax.device_put(adj, sh), jax.device_put(dis, rep),
                jax.device_put(x, sh))
    sup = prep.simple_polynomials(a_sp, 2)
    h = x
    for li, layer in enumerate(params):
        out = sum(sup[k] @ (h @ layer[f"w_{k}"]) for k in range(3))
        if li < len(params) - 1:
            out = np.where(out > 0, out, 0.2 * out)
        h = np.asarray(out, np.float32)
    np.testing.assert_allclose(np.asarray(y), h, atol=5e-3)


def test_sharded_lgs_matches_host(mesh8, rng):
    from distgcn_tpu.solvers.greedy import local_greedy_search
    n = 128
    a_sp = random_graph(rng, n, 0.06)
    adj = a_sp.toarray().astype(np.float32)
    w = np.round(rng.random(n) * 4) / 4  # include ties
    w = w.astype(np.float32)
    mask = np.ones(n, bool)
    lgs = make_sharded_lgs(mesh8, n)
    with mesh8:
        sh2 = NamedSharding(mesh8, P("graph", None))
        sh1 = NamedSharding(mesh8, P("graph"))
        sel, util = lgs(jax.device_put(adj, sh2), jax.device_put(w, sh1),
                        jax.device_put(mask, sh1))
    sel = np.asarray(sel)
    got = set(np.nonzero(sel == 1)[0].tolist())
    want, want_util = local_greedy_search(a_sp, w)
    assert got == want
    assert float(np.asarray(util)[0]) == pytest.approx(want_util, abs=1e-3)


def test_mesh_construction():
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_sharded_train_step_matches_single_device(mesh8, rng):
    """The 8-device data-parallel train step must produce the same loss and
    updated params as running the identical jitted step on one device —
    GSPMD sharding may not change the math."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from distgcn_tpu.core.graph import GraphBatch
    from distgcn_tpu.models.gcn import make_model_from_config
    from distgcn_tpu.parallel.mesh import make_mesh, make_sharded_train_step
    from distgcn_tpu.rl.train import make_optimizer
    from distgcn_tpu.utils.config import Config

    cfg = Config(feature_size=1, hidden1=8, num_layer=2, diver_num=1,
                 max_degree=1, predict="mwis", pad_to=64,
                 learning_rate=1e-3)
    model = make_model_from_config(cfg, "gcn_dqn")
    b, n = 8, 64
    adjs, wtss = [], []
    for _ in range(b):
        a = random_graph(rng, 40, 0.1)
        adjs.append(a)
        wtss.append(rng.random(40))
    gb = GraphBatch.from_scipy(adjs, wtss, pad_to=n)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, n, 1)), jnp.zeros((1, 2, n, n)))["params"]
    optimizer = make_optimizer(cfg.learning_rate)
    opt_state = optimizer.init(params)
    labels = jnp.asarray(rng.random((b, n, 1)), jnp.float32)
    maskf = gb.mask.astype(jnp.float32)

    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        step = make_sharded_train_step(model, cfg, optimizer, mesh)
        bspec = NamedSharding(mesh, P("data"))
        put = lambda x: jax.device_put(x, bspec)
        p8, _, loss8 = step(params, opt_state, put(gb.adj), put(gb.wts),
                            put(maskf), put(labels))

    mesh1 = make_mesh(n_data=1, n_model=1)
    with mesh1:
        step1 = make_sharded_train_step(model, cfg, optimizer, mesh1)
        p1, _, loss1 = step1(params, opt_state, gb.adj, gb.wts, maskf,
                             labels)

    assert float(loss8) == pytest.approx(float(loss1), rel=1e-5)
    for k in p1:
        for kk in p1[k]:
            np.testing.assert_allclose(np.asarray(p8[k][kk]),
                                       np.asarray(p1[k][kk]), atol=1e-6)

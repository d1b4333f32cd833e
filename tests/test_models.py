"""Model forward parity + TF1 checkpoint import tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import random_graph
from distgcn_tpu.core import prep
from distgcn_tpu.core.graph import GraphBatch
from distgcn_tpu.models.gcn import ChebGCN, MLP2, make_model_from_config
from distgcn_tpu.utils.config import Config

REF_MODEL_DIR = "/root/reference/model"


def _leaky(x):
    return np.where(x > 0, x, 0.2 * x)


def manual_forward(params, supports_sp, x, num_layer, final_linear=True,
                   bias=False):
    h = x
    for li in range(1, num_layer + 1):
        layer = params[f"gc{li}"]
        out = sum(np.asarray(s.toarray() if hasattr(s, "toarray") else s,
                             dtype=np.float32) @ (h @ np.asarray(layer[f"w_{k}"]))
                  for k, s in enumerate(supports_sp))
        if bias and "bias" in layer:
            out = out + np.asarray(layer["bias"])
        if li < num_layer or not final_linear:
            out = _leaky(out)
        h = out
    return h


def test_chebgcn_matches_manual_multilayer(rng):
    a = random_graph(rng, 50, 0.1)
    w = rng.random(50)
    gb = GraphBatch.from_scipy([a], [w], bucket=64)
    supports = prep.simple_polynomials_dense(gb.adj, 1)
    x = jnp.asarray(rng.random((1, 64, 4)), dtype=jnp.float32)
    model = ChebGCN(num_layer=3, hidden_dim=8, out_dim=1, num_supports=2)
    params = model.init(jax.random.PRNGKey(0), x, supports)["params"]
    out = model.apply({"params": params}, x, supports)
    sup_sp = prep.simple_polynomials(a, 1)
    want = manual_forward(
        {k: {kk: np.asarray(vv) for kk, vv in v.items()}
         for k, v in params.items()},
        sup_sp, np.asarray(x[0, :50, :]), 3)
    np.testing.assert_allclose(np.asarray(out[0, :50]), want, atol=2e-4)


def test_chebgcn_gcn2_head_activation(rng):
    # GCN2_DQN applies act to the head too (gcn/models.py:701-708)
    a = random_graph(rng, 30, 0.15)
    gb = GraphBatch.from_scipy([a], [np.ones(30)], bucket=32)
    supports = prep.simple_polynomials_dense(gb.adj, 1)
    x = jnp.asarray(rng.standard_normal((1, 32, 2)), dtype=jnp.float32)
    m = ChebGCN(num_layer=1, out_dim=1, num_supports=2, final_act_same=True,
                use_bias=True)
    p = m.init(jax.random.PRNGKey(1), x, supports)["params"]
    out = np.asarray(m.apply({"params": p}, x, supports))
    sup_sp = prep.simple_polynomials(a, 1)
    want = manual_forward(
        {k: {kk: np.asarray(vv) for kk, vv in v.items()}
         for k, v in p.items()}, sup_sp, np.asarray(x[0, :30]), 1,
        final_linear=False, bias=True)
    np.testing.assert_allclose(out[0, :30], want, atol=2e-4)


def test_mlp2_dueling_shapes(rng):
    x = jnp.asarray(rng.random((2, 16, 4)), dtype=jnp.float32)
    m = MLP2(num_layer=3, hidden_dim=8, out_dim=1, is_dual=True)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": p}, x)
    assert out.shape == (2, 16, 1)


@pytest.mark.skipif(not os.path.isdir(REF_MODEL_DIR),
                    reason="reference model zoo not mounted")
def test_tf1_import_1layer_forward_parity(rng):
    pytest.importorskip("tensorflow")
    from distgcn_tpu.compat.tf1_ckpt import (load_tf1_gcn_params,
                                             infer_architecture)
    mdir = os.path.join(
        REF_MODEL_DIR, "result_IS4SAT_deep_ld1_c32_l1_cheb1_diver1_mwis_dqn")
    params = load_tf1_gcn_params(mdir, scope="gcn_dqn")
    arch = infer_architecture(params)
    assert arch["num_layer"] == 1 and arch["num_supports"] == 2
    a = random_graph(rng, 40, 0.1)
    gb = GraphBatch.from_scipy([a], [np.ones(40)], bucket=64)
    supports = prep.simple_polynomials_dense(gb.adj, 1)
    x = jnp.ones((1, 64, 1)) * jnp.asarray(gb.mask)[..., None]
    model = ChebGCN(num_layer=1, out_dim=1, num_supports=2)
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, x, supports)
    sup_sp = prep.simple_polynomials(a, 1)
    want = (sup_sp[0] @ (np.ones((40, 1), np.float32) @ params["gc1"]["w_0"])
            + sup_sp[1] @ (np.ones((40, 1), np.float32) @ params["gc1"]["w_1"]))
    np.testing.assert_allclose(np.asarray(out[0, :40]), want, atol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_MODEL_DIR),
                    reason="reference model zoo not mounted")
def test_tf1_import_20layer(rng):
    pytest.importorskip("tensorflow")
    from distgcn_tpu.compat.tf1_ckpt import (load_tf1_gcn_params,
                                             infer_architecture)
    mdir = os.path.join(
        REF_MODEL_DIR, "result_IS4SAT_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn")
    params = load_tf1_gcn_params(mdir, scope="gcn_dqn")
    arch = infer_architecture(params)
    assert arch["num_layer"] == 20
    assert arch["hidden_dim"] == 32 and arch["out_dim"] == 1
    cfg = Config(feature_size=1, hidden1=32, num_layer=20, diver_num=1,
                 max_degree=1)
    model = make_model_from_config(cfg, "gcn_dqn")
    a = random_graph(rng, 30, 0.15)
    gb = GraphBatch.from_scipy([a], [np.ones(30)], bucket=32)
    supports = prep.simple_polynomials_dense(gb.adj, 1)
    x = jnp.ones((1, 32, 1)) * jnp.asarray(gb.mask)[..., None]
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, x, supports)
    sup_sp = prep.simple_polynomials(a, 1)
    want = manual_forward(
        {k: {kk: np.asarray(vv) for kk, vv in v.items()}
         for k, v in params.items()}, sup_sp,
        np.ones((30, 1), np.float32), 20)
    np.testing.assert_allclose(np.asarray(out[0, :30]), want, atol=5e-4,
                               rtol=1e-4)

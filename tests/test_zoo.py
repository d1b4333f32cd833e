"""Reference model-zoo import sweep.

The reference ships 46 TF1 checkpoint dirs under `model/` (SURVEY §2.1 C41)
whose folder names encode an architecture (`directory.py:33-40`) — but a
few dirs were overwritten with differently-shaped weights by the original
researchers (e.g. `..._ld1_c1_l1_cheb2_...` actually holds three (32,1)
supports). The importer must therefore trust checkpoint shapes, not names.
This sweep asserts every zoo checkpoint imports and that representative
families produce finite GCN outputs end-to-end.
"""

import os

import numpy as np
import pytest

from conftest import random_graph

ZOO = "/root/reference/model"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ZOO), reason="reference model zoo not mounted")


def _dirs():
    return sorted(d for d in os.listdir(ZOO)
                  if os.path.isdir(os.path.join(ZOO, d)))


def test_all_zoo_checkpoints_import():
    from distgcn_tpu.compat.tf1_ckpt import (load_tf1_gcn_params,
                                             infer_architecture)
    dirs = _dirs()
    assert len(dirs) >= 40
    for d in dirs:
        raw = None
        for scope in ("gcn_dqn", "model", "gcn2_dqn"):
            try:
                raw = load_tf1_gcn_params(os.path.join(ZOO, d), scope=scope)
            except Exception:
                continue
            if raw:
                break
        assert raw, f"no importable params in {d}"
        arch = infer_architecture(raw)
        assert arch["num_layer"] >= 1 and arch["num_supports"] >= 2, (d, arch)
        for layer in raw.values():
            for v in layer.values():
                assert np.all(np.isfinite(np.asarray(v))), f"non-finite in {d}"


@pytest.mark.parametrize("name", [
    "result_IS4SAT_deep_ld1_c32_l1_cheb1_diver1_mwis_dqn",   # flagship 1-layer
    "result_IS4SAT_deep_ld1_c32_l20_cheb1_diver1_mwis_dqn",  # flagship deep
    "result_DQNBA_deep_ld1_c32_l3_cheb1_diver1_mwis_dqn",    # BA family
    "result_IS4SAT_deep_ld32_c32_l2_cheb1_diver1_mwis_dqn",  # overwritten dims
])
def test_zoo_checkpoint_forward_and_solve(name, rng):
    from distgcn_tpu.agents import DQNAgent
    from distgcn_tpu.compat.tf1_ckpt import (load_tf1_gcn_params,
                                             infer_architecture)
    from distgcn_tpu.solvers.greedy import greedy_search
    from distgcn_tpu.utils.config import Config

    raw = load_tf1_gcn_params(os.path.join(ZOO, name), scope="gcn_dqn")
    arch = infer_architecture(raw)
    cfg = Config(feature_size=arch["feature_size"],
                 hidden1=arch["hidden_dim"], num_layer=arch["num_layer"],
                 diver_num=arch["out_dim"], max_degree=arch["num_supports"] - 1,
                 predict="mwis", epsilon=0.0, pad_to=64)
    agent = DQNAgent(cfg, model_family="gcn_dqn")
    assert agent.load(os.path.join(ZOO, name))

    a = random_graph(rng, 40, 0.1)
    w = rng.random(40)
    mwis, util = agent.solve_mwis(a, w)
    _, grd = greedy_search(a, w)
    assert np.isfinite(util) and util > 0
    # GCN-weighted LGS output must itself be an independent set
    sel = sorted(mwis)
    sub = a[np.ix_(sel, sel)]
    assert sub.nnz == 0


def test_mismatched_flags_reconcile_to_checkpoint_shapes(rng):
    """Loading a zoo dir whose weights disagree with the flag-derived
    architecture (the overwritten cheb2 dirs) rebuilds the model from the
    checkpoint shapes (`MWISSolver._reconcile_arch`) instead of crashing
    at the first forward."""
    from distgcn_tpu.agents import DQNAgent
    from distgcn_tpu.utils.config import Config

    name = "result_IS4SAT_deep_ld1_c1_l1_cheb2_diver1_mwis_dqn"
    if not os.path.isdir(os.path.join(ZOO, name)):
        pytest.skip("cheb2 zoo dir absent")
    # flags as the folder NAME claims: ld1 c1 l1 cheb2
    cfg = Config(feature_size=1, hidden1=1, num_layer=1, diver_num=1,
                 max_degree=2, predict="mwis", epsilon=0.0, pad_to=64)
    agent = DQNAgent(cfg, model_family="gcn_dqn")
    assert agent.load(os.path.join(ZOO, name))
    # the dir actually holds feature_size=32 weights with 3 supports
    assert agent.flags.feature_size == 32
    assert agent.flags.num_supports == 3
    a = random_graph(rng, 40, 0.1)
    w = rng.random(40)
    mwis, util = agent.solve_mwis(a, w)
    assert np.isfinite(util) and util > 0
    sel = sorted(mwis)
    assert a[np.ix_(sel, sel)].nnz == 0
    # trainer/target state must be re-shaped for the reconciled params
    import jax
    assert (jax.tree_util.tree_structure(agent.target_params)
            == jax.tree_util.tree_structure(agent.params))
    assert (jax.tree_util.tree_structure(agent.trainer.opt_state)
            == jax.tree_util.tree_structure(
                agent.trainer.optimizer.init(agent.params)))

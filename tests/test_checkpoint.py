"""Training-state checkpoint round-trip tests."""

import numpy as np
import jax

from conftest import random_graph
from distgcn_tpu.agents import DQNAgent
from distgcn_tpu.rl.checkpoint import load_training_state, save_training_state
from distgcn_tpu.utils.config import Config


def cfg():
    return Config(feature_size=1, hidden1=8, num_layer=1, diver_num=1,
                  max_degree=1, predict="mwis", epsilon=0.7, pad_to=64,
                  learning_rate=1e-3)


def test_training_state_roundtrip(tmp_path, rng):
    agent = DQNAgent(cfg(), model_family="gcn_dqn")
    # do some training so the optimizer state is nontrivial
    from distgcn_tpu.solvers.greedy import greedy_search
    for _ in range(4):
        a = random_graph(rng, 30, 0.15)
        w = rng.random(30)
        _, g = greedy_search(a, w)
        agent.solve_mwis(a, w, train=True, grd=g)
    agent.replay(4)
    save_training_state(str(tmp_path), agent, best_ratio=0.91, step=7)

    agent2 = DQNAgent(cfg(), model_family="gcn_dqn", seed=3)
    meta = load_training_state(str(tmp_path), agent2)
    assert meta["best_ratio"] == 0.91 and meta["step"] == 7
    assert agent2.epsilon == agent.epsilon
    for x, y in zip(jax.tree_util.tree_leaves(agent.params),
                    jax.tree_util.tree_leaves(agent2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree_util.tree_leaves(agent.trainer.opt_state),
                    jax.tree_util.tree_leaves(agent2.trainer.opt_state)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_missing_returns_none(tmp_path):
    agent = DQNAgent(cfg(), model_family="gcn_dqn")
    assert load_training_state(str(tmp_path / "nope"), agent) is None

"""Jitted replay training.

Reproduces the GDPG replay semantics (mwis_gdpg_call.py:707-769) and the DQN
flavor (mwis_dqn_call.py:151-186) but executes the whole minibatch as **one
device program**: a `lax.scan` over samples, each step computing the
per-sample RMSE loss and applying its own Adam update — bit-faithful to the
reference's sequential per-sample `sess.run(opt_op)` sweep, without B host
round-trips.

Loss parity (GCN2_DQN._loss, gcn/models.py:613-626):
    loss = sqrt(mean((out[:, :1] - labels)^2)) + weight_decay * l2(layer-1
    vars),  l2(v) = sum(v^2)/2 (tf.nn.l2_loss)
with the mean taken over the real (unpadded) nodes.

Target construction parity (mwis_gdpg_call.py:723-756):
    target_f = act_vals;  target_f[action, :] += reward
    labels_i = target_f_i / std(all targets) - mean(all targets) + 1.0
(DQN flavor instead assigns target_f[solution] = reward, no standardization.)
"""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp
import optax

from distgcn_tpu.agents import build_state_arrays
from distgcn_tpu.core.graph import GraphBatch, pad_bucket


def tf1_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
             eps: float = 1e-8):
    """Bit-faithful `tf.compat.v1.train.AdamOptimizer` update rule.

    TF1 Adam (unlike optax.adam, which adds eps to the bias-CORRECTED
    sqrt(v_hat)) folds the bias corrections into the step size and adds eps
    to the raw sqrt(v):

        lr_t = lr * sqrt(1 - b2^t) / (1 - b1^t)
        p   -= lr_t * m_t / (sqrt(v_t) + eps)

    The two differ by an effective eps factor of 1/sqrt(1-b2^t) — tiny, but
    it is exactly the kind of residual the TF1 train-step golden fixtures
    (tests/test_tf1_golden_train.py) are meant to rule out, so the replay
    trainer uses the TF formulation. `learning_rate` may be a schedule
    (callable of the 0-based update count, matching tf1 global_step
    semantics: minimize() reads the step BEFORE incrementing it).
    """
    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"count": jnp.zeros([], jnp.int32), "m": z,
                "v": jax.tree_util.tree_map(jnp.zeros_like, params)}

    def update_fn(grads, state, params=None):
        del params
        lr = learning_rate(state["count"]) if callable(learning_rate) \
            else learning_rate
        m = jax.tree_util.tree_map(lambda m, g: b1 * m + (1.0 - b1) * g,
                                   state["m"], grads)
        v = jax.tree_util.tree_map(lambda v, g: b2 * v + (1.0 - b2) * g * g,
                                   state["v"], grads)
        t = (state["count"] + 1).astype(jnp.float32)
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        updates = jax.tree_util.tree_map(
            lambda m, v: -lr_t * m / (jnp.sqrt(v) + eps), m, v)
        return updates, {"count": state["count"] + 1, "m": m, "v": v}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float, learning_decay: float = 1.0):
    """TF1-exact Adam with the reference's staircase exponential decay
    (gcn/models.py:602-609: decay every 5000 steps)."""
    if learning_decay < 1.0:
        sched = optax.exponential_decay(learning_rate, 5000, learning_decay,
                                        staircase=True)
        return tf1_adam(sched)
    return tf1_adam(learning_rate)


class ReplayTrainer:
    """Owns the optimizer state and the jitted per-bucket replay step."""

    def __init__(self, agent, style: str = "gdpg"):
        self.agent = agent
        self.style = style
        self.optimizer = make_optimizer(agent.flags.learning_rate,
                                        agent.flags.learning_decay)
        self.opt_state = self.optimizer.init(agent.params)
        self._step_cache = {}

    # ------------------------------------------------------------------
    def _make_step(self, num_samples: int):
        model = self.agent.model
        flags = self.agent.flags
        optimizer = self.optimizer
        wd = flags.weight_decay

        def loss_fn(params, features, supports, labels, mask):
            out = model.apply({"params": params}, features[None],
                              supports[None])[0]          # [N, out_dim]
            err = (out[:, :1] - labels) ** 2
            mse = jnp.sum(err[:, 0] * mask) / jnp.maximum(jnp.sum(mask), 1.0)
            loss = jnp.sqrt(mse)
            # weight decay on layer-1 vars only (gcn/models.py:614-616)
            first_key = "gc1" if "gc1" in params else sorted(params.keys())[0]
            l2 = sum(jnp.sum(v ** 2) / 2.0
                     for v in jax.tree_util.tree_leaves(params[first_key]))
            return loss + wd * l2

        @jax.jit
        def step(params, opt_state, adj, wts, mask, labels):
            features, supports = build_state_arrays(
                adj, wts, mask > 0, flags.feature_size, flags.max_degree,
                flags.predict, self.agent.feature_mode)

            def body(carry, xs):
                params, opt_state = carry
                f, s, lab, m = xs
                loss, grads = jax.value_and_grad(loss_fn)(params, f, s, lab, m)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (features, supports, labels, mask))
            return params, opt_state, jnp.mean(losses)

        return step

    # ------------------------------------------------------------------
    def train_minibatch(self, minibatch: List[tuple]) -> float:
        """minibatch entries: (compact_state, act_vals, action, next_state,
        reward) — agents.MWISSolver.memorize format."""
        agent = self.agent
        adjs, wtss, targets = [], [], []
        for state, act_vals, action, _next, reward in minibatch:
            av = np.array(act_vals, dtype=np.float64, copy=True)
            if av.ndim == 1:
                av = av[:, None]
            if self.style == "gdpg":
                av[np.asarray(action, dtype=int), :] += reward
            elif self.style == "dqn_origin":
                # mwis_dqn_origin.py:216: target_f[solu] = reward + wts_norm
                # with wts_norm = wts[solu]/greedy_util; greedy_util isn't
                # memorized but reward = total/greedy, so w/greedy =
                # w * reward / total
                idx = np.asarray(action, dtype=int)
                w = np.asarray(state["wts"], dtype=np.float64).flatten()[idx]
                tot = float(w.sum())
                scale = reward / tot if tot > 0 else 0.0
                av[idx, :] = reward + (w * scale)[:, None]
            else:  # dqn flavor: assignment (mwis_dqn_call.py:168-171)
                av[np.asarray(action, dtype=int), :] = reward
            adjs.append(state["adj"])
            wtss.append(np.asarray(state["wts"]).flatten())
            targets.append(av)

        if self.style == "gdpg":
            flat = np.concatenate([t.flatten() for t in targets])
            b_avg = float(np.mean(flat))
            b_std = float(np.std(flat))
            std = b_std if b_std > 0 else 1.0
            targets = [t / std - b_avg + 1.0 for t in targets]

        bucket = pad_bucket(max(a.shape[0] for a in adjs), agent.flags.pad_to)
        gb = GraphBatch.from_scipy(adjs, wtss, pad_to=bucket)
        b, n = gb.wts.shape
        labels = np.zeros((b, n, 1), dtype=np.float32)
        for i, t in enumerate(targets):
            labels[i, : t.shape[0], 0] = t[:, 0]
        maskf = np.asarray(gb.mask, dtype=np.float32)

        key = (len(minibatch), bucket)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_step(len(minibatch))
        step = self._step_cache[key]
        params, self.opt_state, loss = step(
            agent.params, self.opt_state, gb.adj, gb.wts,
            jnp.asarray(maskf), jnp.asarray(labels))
        agent.params = params
        return float(loss)


def make_supervised_diver_step(model, optimizer, diver_num: int):
    """Jitted supervised step for GCN_DEEP_DIVER training: hindsight-min
    weighted CE over the diver heads (gcn/models.py:327-334) on labeled
    graphs (`mwis_label` field of the reference datasets).

    Returns step(params, opt_state, features, supports, mask, labels01,
    node_weights) -> (params, opt_state, loss).
    """
    from distgcn_tpu.rl.losses import hindsight_diver_ce

    @jax.jit
    def step(params, opt_state, features, supports, mask, labels01, node_w):
        def loss_fn(p):
            out = model.apply({"params": p}, features, supports, mask)
            m = mask.astype(out.dtype)
            # weight only real nodes; CE is node-weight-normalized
            w = node_w * m
            losses = jax.vmap(hindsight_diver_ce, in_axes=(0, 0, 0, None))(
                out, labels01, w, diver_num)
            return jnp.mean(losses)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step

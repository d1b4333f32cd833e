"""Agent / solver API — the framework surface of the reference.

Re-designs `mwis_gdpg_call.py`'s `MWISSolver` / `DQNAgent` (the canonical
agent API all reference drivers were written against; see also the
flag-driven twin in `mwis_dqn_call.py`). Inputs/outputs match the reference:
scipy sparse adjacency + (N,) or (N,1) weights in, python ``set`` of node ids
+ total utility out.

TPU redesign vs the reference:
- One jitted forward per padding bucket instead of a feed_dict per graph
  (`mwis_gdpg_call.py:690-694`): state construction, support polynomials,
  GCN forward and the LGS solve all run in a single device program
  (`solve_mwis_device` / `_solve_compiled`).
- The iterative solvers (DIT / CGS / rollout) run as fixed-shape masked
  loops on device (see solvers/iterative.py) instead of host re-slicing
  (`mwis_gdpg_call.py:288-317`).
- Replay is a single device launch scanning the minibatch with per-sample
  Adam updates (rl/train.py) instead of a python loop of `sess.run`
  (`mwis_gdpg_call.py:754-759`).

Training semantics preserved (mwis_gdpg_call.py):
- makestate features (:82-97): predict='mwis' -> row-normalized ones
  (= 1/feature_size); else weight-scaled features.
- act (:696-705): epsilon only affects the returned `action` sample, NOT
  act_vals (the reference quirk — exploration in GDPG training comes from
  per-graph weight re-randomization, mwis_gdpg_train.py:94).
- memorize / replay (:707-769): target_f[solution] += reward; batch
  standardization target/std - mean + 1; memory cleared after replay;
  epsilon decay; target net sync every C=10 replays.
"""

from __future__ import annotations

import functools
import os
import random as _random
from collections import deque
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from distgcn_tpu.core.graph import GraphBatch, pad_bucket
from distgcn_tpu.core import prep
from distgcn_tpu.models.gcn import make_model_from_config
from distgcn_tpu.ops.lgs import batched_lgs
from distgcn_tpu.utils.config import Config


def build_state_arrays(adj: jnp.ndarray, wts: jnp.ndarray, mask: jnp.ndarray,
                       feature_size: int, max_degree: int,
                       predict: str = "mwis", feature_mode: str = "gdpg"):
    """Device-side `makestate` (mwis_gdpg_call.py:82-97).

    Returns (features [B,N,F], supports [B,S,N,N]).

    predict='mwis': features = row-normalized ones = 1/F on every real node
    (feature_mode='gdpg'), or 1/F only where w != 0 (feature_mode='dqn',
    matching mwis_dqn_call.py:129-138 which feeds w/||w|| then
    row-normalizes — zero-weight rows normalize to 0).
    predict!='mwis': features = w / max(w) broadcast across F (gdpg family,
    no row normalization).
    """
    supports = prep.simple_polynomials_dense(adj, max_degree)
    return build_features(wts, mask, feature_size, predict,
                          feature_mode), supports


def build_features(wts: jnp.ndarray, mask: jnp.ndarray, feature_size: int,
                   predict: str = "mwis", feature_mode: str = "gdpg"):
    """The weight-dependent half of `build_state_arrays` — resident
    pipelines precompute the supports once and rebuild only this per slot."""
    b, n = wts.shape
    m = mask.astype(wts.dtype)
    if predict == "mwis":
        base = jnp.full((b, n, feature_size), 1.0 / feature_size,
                        dtype=wts.dtype)
        if feature_mode == "dqn":
            nz = (wts != 0).astype(wts.dtype)
            return base * (m * nz)[..., None]
        return base * m[..., None]
    norm = jnp.max(jnp.abs(wts) * m, axis=-1, keepdims=True) + 1e-9
    features = jnp.repeat((wts / norm)[..., None], feature_size, axis=-1)
    return features * m[..., None]


class MWISSolver:
    """Base agent: GCN scoring + greedy-family MWIS search.

    API parity with mwis_gdpg_call.py:52-659 — `makestate`, `act`, `predict`,
    `schedule`, `utility`, `topology_encode`, `solve_mwis`, `solve_mwis_util`,
    `solve_mwis_dit`, `solve_mwis_cit_wrap`, `solve_mwis_rollout_wrap`,
    `memorize`, `load`, `save`.
    """

    def __init__(self, flags: Config, memory_size: int = 5000,
                 model_family: str = "gcn2_dqn", seed: int = 0):
        self.flags = flags
        self.feature_size = flags.feature_size
        self.memory: deque = deque(maxlen=memory_size)
        self.reward_mem: deque = deque(maxlen=memory_size)
        self.delta = 1e-6
        self.gamma = flags.gamma
        self.epsilon = flags.epsilon
        self.epsilon_min = flags.epsilon_min
        self.epsilon_decay = flags.epsilon_decay
        self.learning_rate = flags.learning_rate
        self.model_family = model_family
        self.model = make_model_from_config(flags, model_family)
        self.feature_mode = "gdpg"
        self._rng = np.random.default_rng(seed)
        self._seed = seed
        self._init_params(jax.random.PRNGKey(seed))
        self.opt_state = None  # set by trainer

    def _init_params(self, key) -> None:
        n0 = self.flags.pad_to
        feats = jnp.zeros((1, n0, self.flags.feature_size))
        sups = jnp.zeros((1, self.flags.num_supports, n0, n0))
        self.params = self.model.init(key, feats, sups)["params"]

    # ------------------------------------------------------------------ io
    def load(self, name: str) -> bool:
        """Load params: native .npz if present, else TF1 checkpoint import
        (mwis_gdpg_call.py:109-114 directory protocol)."""
        npz = os.path.join(name, "params.npz")
        if os.path.isfile(npz):
            from distgcn_tpu.utils.serialization import load_params
            self.params = load_params(npz)
            print(f"loaded {npz}")
            self._reconcile_arch()
            return True
        try:
            from distgcn_tpu.compat import tf1_ckpt
            scope = "gcn_dqn" if self.model_family == "gcn_dqn" else "gcn2_dqn"
            raw = tf1_ckpt.load_tf1_gcn_params(name, scope=scope)
        except (FileNotFoundError, ValueError, ImportError):
            return False
        self.params = jax.tree_util.tree_map(jnp.asarray, raw)
        print(f"loaded TF1 checkpoint from {name}")
        # outside the try: a reconcile failure must surface, not be
        # swallowed into "load failed" after params were already replaced
        self._reconcile_arch()
        return True

    def _reconcile_arch(self) -> None:
        """Rebuild the model (and the flags that drive feature/support
        construction) from loaded parameter shapes when they disagree with
        the configured ones. A few reference zoo dirs hold differently-
        shaped weights than their names claim (e.g. the cheb2 dirs carry
        feature_size=32 weights under an ld1 name); the importer trusts
        shapes, not names — same policy as tests/test_zoo.py."""
        import dataclasses
        try:
            from distgcn_tpu.compat.tf1_ckpt import infer_architecture
            arch = infer_architecture(self.params)
        except Exception:
            return      # non-ChebGCN layouts (mlp2, skip heads): keep as-is
        cfg = self.flags
        # bias is part of the checkpoint's structure, not its dims: loading
        # a biased (gcn2_dqn-trained) npz into a no-bias gcn_dqn agent (or
        # vice versa) must rebuild the model, or the first optimizer.update
        # dies on an Adam-state tree mismatch
        has_bias = any(isinstance(layer, dict) and "bias" in layer
                       for layer in self.params.values())
        if (hasattr(self.model, "use_bias")
                and bool(self.model.use_bias) != has_bias):
            import dataclasses as _dc
            self.model = _dc.replace(self.model, use_bias=has_bias)
            self.__dict__.pop("_forward_fn", None)
            if hasattr(self, "target_params"):
                self.target_params = jax.tree_util.tree_map(jnp.copy,
                                                            self.params)
            if hasattr(self, "trainer"):
                from distgcn_tpu.rl.train import ReplayTrainer
                self.trainer = ReplayTrainer(self, style=self.trainer.style)
            print(f"checkpoint bias structure overrides model: "
                  f"use_bias={has_bias}")
        if self.model_family == "gcn2_dqn":
            out_flag, diver = 1, cfg.diver_num
        elif self.model_family == "deep_diver":
            out_flag, diver = 2 * cfg.diver_num, max(arch["out_dim"] // 2, 1)
        else:
            out_flag, diver = cfg.diver_num, arch["out_dim"]
        if (arch["feature_size"] == cfg.feature_size
                # 1-layer ckpts don't pin the hidden dim (hidden_dim ==
                # out_dim there), so skip that term or every matching
                # 1-layer load would spuriously rebuild the model/trainer
                and (arch["num_layer"] == 1
                     or arch["hidden_dim"] == cfg.hidden1)
                and arch["num_layer"] == cfg.num_layer
                and arch["num_supports"] == cfg.num_supports
                and arch["out_dim"] == out_flag):
            return
        hidden = (arch["hidden_dim"] if arch["num_layer"] > 1
                  else cfg.hidden1)   # 1-layer ckpts don't pin the hidden dim
        self.flags = dataclasses.replace(
            cfg, feature_size=arch["feature_size"], hidden1=hidden,
            num_layer=arch["num_layer"],
            max_degree=arch["num_supports"] - 1, diver_num=diver)
        self.feature_size = self.flags.feature_size
        self.model = make_model_from_config(self.flags, self.model_family)
        self.__dict__.pop("_forward_fn", None)   # drop stale jitted forward
        # refresh state that was shaped by the pre-load architecture
        if hasattr(self, "target_params"):
            self.target_params = jax.tree_util.tree_map(jnp.copy,
                                                        self.params)
        if hasattr(self, "trainer"):
            from distgcn_tpu.rl.train import ReplayTrainer
            self.trainer = ReplayTrainer(self, style=self.trainer.style)
        print(f"checkpoint shapes override config: feature_size="
              f"{self.flags.feature_size} num_layer={self.flags.num_layer} "
              f"supports={arch['num_supports']} out_dim={arch['out_dim']}")

    def save(self, name: str) -> None:
        from distgcn_tpu.utils.serialization import save_params
        os.makedirs(name, exist_ok=True)
        save_params(os.path.join(name, "params.npz"), self.params)

    # --------------------------------------------------------------- state
    def makestate(self, adj, wts_nn) -> dict:
        """Host-facing state dict (kept for API parity; the device path
        builds state arrays inline)."""
        gb = self._to_batch(adj, np.asarray(wts_nn))
        features, supports = build_state_arrays(
            gb.adj, gb.wts, gb.mask, self.flags.feature_size,
            self.flags.max_degree, self.flags.predict, self.feature_mode)
        return {"graph": gb, "features": features, "supports": supports,
                "wts": np.asarray(wts_nn, dtype=np.float32).flatten(),
                "adj": sp.csr_matrix(adj)}

    def _to_batch(self, adj, wts) -> GraphBatch:
        n = adj.shape[0]
        bucket = pad_bucket(n, self.flags.pad_to)
        return GraphBatch.single(adj, wts, pad_to=bucket)

    # ------------------------------------------------------------- forward
    @functools.cached_property
    def _forward_fn(self):
        model = self.model

        @jax.jit
        def fwd(params, features, supports, mask):
            out = model.apply({"params": params}, features, supports)
            return out * mask[..., None]

        return fwd

    def predict(self, state) -> Tuple[np.ndarray, np.ndarray]:
        """act_values (N, out_dim) + argmax action (mwis_gdpg_call.py:690-694)."""
        gb: GraphBatch = state["graph"]
        out = self._forward_fn(self.params, state["features"],
                               state["supports"], gb.mask)
        n = int(gb.nn[0])
        act_values = np.asarray(out[0, :n, :])
        action = np.argmax(act_values, axis=0)
        return act_values, action

    def act(self, state, train: bool):
        act_values, action = self.predict(state)
        if train and self._rng.random() <= self.epsilon:
            # reference quirk: epsilon replaces only `action`
            # (mwis_gdpg_call.py:696-705); act_values pass through.
            action = self._rng.random((act_values.size, 1))
        return act_values, action

    # ------------------------------------------------------------- solvers
    def _gcn_weights(self, act_vals: np.ndarray, wts_nn: np.ndarray
                     ) -> np.ndarray:
        """predict='mwis': w * gcn_out; else gcn_out
        (mwis_gdpg_call.py:211-217)."""
        if self.flags.predict == "mwis":
            return np.multiply(act_vals.flatten()[: wts_nn.size],
                               wts_nn.flatten())
        return act_vals.flatten()[: wts_nn.size]

    def solve_mwis(self, adj_0, wts_0, train: bool = False, grd: float = 1.0):
        """GCN + LGS, one shot (mwis_gdpg_call.py:200-235)."""
        wts_nn = np.reshape(np.asarray(wts_0, dtype=np.float64), (-1, 1))
        state = self.makestate(adj_0, wts_nn)
        act_vals, act = self.act(state, train)
        gcn_wts = self._gcn_weights(act_vals, wts_nn)
        mwis, total_wt = self._lgs_host_or_device(state, gcn_wts, wts_nn)
        if train:
            reward = total_wt / (grd + 1e-6)
            if not np.isnan(reward):
                self.memorize(state, act_vals.copy(), list(mwis), {}, reward)
        return mwis, total_wt

    def schedule(self, adj_0, wts_0, train: bool = False):
        """GCN + LGS returning (mwis, util, state, act_vals)
        (mwis_gdpg_call.py:162-187)."""
        wts_nn = np.reshape(np.asarray(wts_0, dtype=np.float64), (-1, 1))
        state = self.makestate(adj_0, wts_nn)
        act_vals = self.act(state, train)
        if isinstance(act_vals, tuple):
            act_vals = act_vals[0]
        gcn_wts = self._gcn_weights(act_vals, wts_nn)
        mwis, total_wt = self._lgs_host_or_device(state, gcn_wts, wts_nn)
        return mwis, total_wt, state, act_vals

    def utility(self, adj_0, wts_0, train: bool = False):
        """GCN output only (mwis_gdpg_call.py:147-160)."""
        wts_nn = np.reshape(np.asarray(wts_0, dtype=np.float64),
                            (-1, self.flags.feature_size))
        state = self.makestate(adj_0, wts_nn[:, :1])
        act_vals, _ = self.act(state, train)
        return act_vals, state

    def topology_encode(self, adj_0, wts_0, train: bool = False):
        """mwis_gdpg_call.py:189-198."""
        wts_nn = np.reshape(np.asarray(wts_0), (-1, 1))
        state = self.makestate(adj_0, wts_nn)
        act_vals, _ = self.act(state, train)
        return act_vals

    def solve_mwis_util(self, adj_0, wts_0, wts_u, train: bool = False,
                        grd: float = 1.0):
        """Utility-weighted variant (mwis_gdpg_call.py:237-276)."""
        wts_nn = np.reshape(np.asarray(wts_0, dtype=np.float64), (-1, 1))
        state = self.makestate(adj_0, wts_nn)
        act_vals, act = self.act(state, train)
        gcn_wts = self._gcn_weights(act_vals, wts_nn)
        mwis, _ = self._lgs_host_or_device(state, gcn_wts, wts_nn)
        wts_u = np.asarray(wts_u).flatten()
        total_wt = float(wts_u[list(mwis)].sum())
        if train:
            reward = total_wt / (grd + 1e-6)
            if not np.isnan(reward):
                self.memorize(state, act_vals.copy(), list(mwis), wts_u,
                              reward)
        return mwis, total_wt

    def _lgs_host_or_device(self, state, gcn_wts, wts_nn):
        """LGS on device using the already-resident graph; returns the
        reference (set, util-under-original-weights)."""
        gb: GraphBatch = state["graph"]
        n = int(gb.nn[0])
        padded = np.zeros((1, gb.pad_n), dtype=np.float32)
        padded[0, :n] = gcn_wts
        sel, _, _ = batched_lgs(gb.adj, jnp.asarray(padded), gb.mask)
        sel = np.asarray(sel[0, :n])
        mwis = set(np.nonzero(sel == 1)[0].tolist())
        total_wt = float(np.asarray(wts_nn).flatten()[list(mwis)].sum()) \
            if mwis else 0.0
        return mwis, total_wt

    # ------------------------------------------------- resident fast path
    def prepare(self, adj) -> dict:
        """Pin a conflict graph on device for repeated scheduling with
        changing weights (the wireless per-timeslot workload: graph static,
        utilities change every slot). Supports ([B,S,N,N] — the biggest
        per-solve stream) and the boolean adjacency are precomputed HERE so
        per-slot launches rebuild only the [B,N,F] features. Returns an
        opaque handle."""
        from distgcn_tpu.pipeline import make_resident_pipeline
        n = adj.shape[0]
        gb = self._to_batch(adj, np.zeros(n))
        supports = prep.simple_polynomials_dense(gb.adj,
                                                 self.flags.max_degree)
        if getattr(self.flags, "compute_dtype", "float32") == "bfloat16":
            supports = supports.astype(jnp.bfloat16)
        if not hasattr(self, "_resident_pipe"):
            self._resident_pipe = make_resident_pipeline(
                self.model, self.flags, self.feature_mode)
        return {"gb": gb, "n": n, "supports": supports,
                "adjb": gb.adj > 0}

    def solve_mwis_resident(self, handle: dict, wts) -> Tuple[set, float]:
        """GCN+LGS on a prepared graph: streams only the weight vector."""
        gb: GraphBatch = handle["gb"]
        n = handle["n"]
        w = np.zeros((1, gb.pad_n), dtype=np.float32)
        w[0, :n] = np.asarray(wts, dtype=np.float32).flatten()
        sel, util = self._resident_pipe(self.params, handle["supports"],
                                        handle["adjb"], jnp.asarray(w),
                                        gb.mask)
        sel = np.asarray(sel[0, :n])
        mwis = set(np.nonzero(sel == 1)[0].tolist())
        return mwis, float(util[0])

    # delegated iterative/rollout solvers (solvers/iterative.py)
    def solve_mwis_dit(self, adj_0, wts_0, train: bool = False,
                       grd: float = 1.0):
        from distgcn_tpu.solvers.iterative import solve_dit
        return solve_dit(self, adj_0, wts_0)

    def solve_mwis_cit_wrap(self, adj_0, wts_0, train: bool = False,
                            grd: float = 1.0):
        from distgcn_tpu.solvers.iterative import solve_cgs
        return solve_cgs(self, adj_0, wts_0)

    solve_mwis_cit = solve_mwis_cit_wrap

    def solve_mwis_rollout_wrap(self, adj_0, wts_0, train: bool = False,
                                grd: float = 1.0, b: int = 16):
        from distgcn_tpu.solvers.iterative import solve_rollout
        return solve_rollout(self, adj_0, wts_0, b=b)

    # -------------------------------------------------------------- memory
    def memorize(self, state, act_vals, solu, next_state, reward) -> None:
        self.memory.append((self._compact_state(state), np.asarray(act_vals),
                            list(solu), next_state, float(reward)))
        self.reward_mem.append(float(reward))

    @staticmethod
    def _compact_state(state) -> dict:
        """Store only (sparse adj, wts) — supports/features are recomputed on
        device at replay time (they are pure functions of these)."""
        return {"adj": state["adj"], "wts": state["wts"]}

    def mellowmax(self, q_vec, omega, beta=None):
        """mwis_gdpg_call.py:140-145."""
        q = np.asarray(q_vec, dtype=np.float64)
        c = q.max()
        return c + np.log(np.sum(np.exp(omega * (q - c))) / q.size) / omega


class DQNAgent(MWISSolver):
    """GDPG/DQN agent with a target network (mwis_gdpg_call.py:662-839)."""

    def __init__(self, flags: Config, memory_size: int = 5000,
                 model_family: str = "gcn2_dqn", seed: int = 0):
        super().__init__(flags, memory_size, model_family, seed)
        self.target_params = jax.tree_util.tree_map(jnp.copy, self.params)
        self.update_cnt = 0
        self.C = 10
        from distgcn_tpu.rl.train import ReplayTrainer
        self.trainer = ReplayTrainer(self)

    def update_target_model(self) -> None:
        """copy model -> target (mwis_gdpg_call.py:771-776)."""
        self.target_params = jax.tree_util.tree_map(jnp.copy, self.params)

    def replay(self, batch_size: int) -> Optional[float]:
        """GDPG replay (mwis_gdpg_call.py:707-769): target-net sync every C,
        reward-augmented targets, batch standardization, per-sample updates
        (executed as one on-device scan), memory clear, epsilon decay."""
        if len(self.memory) < batch_size:
            return None
        if self.update_cnt > self.C or self.update_cnt == 0:
            self.update_target_model()
            self.update_cnt = 0
        self.update_cnt += 1
        minibatch = _random.sample(list(self.memory), batch_size)
        loss = self.trainer.train_minibatch(minibatch)
        self.memory.clear()
        if self.epsilon > self.epsilon_min:
            self.epsilon *= self.epsilon_decay
        return loss

    def solve_mwis_cgs_train(self, adj_0, wts_0, train: bool = False,
                             grd: float = 1.0):
        """Episodic centralized-greedy rollout with backtracked discounted
        rewards (mwis_gdpg_call.py:778-839)."""
        from distgcn_tpu.solvers.iterative import solve_cgs_episodic
        return solve_cgs_episodic(self, adj_0, wts_0, train=train, grd=grd)

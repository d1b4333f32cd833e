"""Device mesh construction and sharded training/inference.

The reference is single-process single-GPU (one tf.Session,
mwis_dqn_call.py:336-340). Here scale-out is first-class:

- ``data`` axis: graphs in a batch are sharded across devices (DP). All
  batch arrays carry ``P('data', ...)``; parameters are replicated; XLA
  inserts the gradient all-reduce over ICI.
- ``model`` axis: the hidden dimension of GCN weight matrices is sharded
  (TP). For the reference's tiny models this is overkill (hidden<=64), but
  the mesh axis is wired so large hidden widths partition without code
  changes.

Everything uses GSPMD via `jax.jit` + `NamedSharding` — no hand-written
collectives on this path (the Pallas halo-exchange SpMM for giant single
graphs lives in parallel/halo.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import optax

from distgcn_tpu.agents import build_state_arrays
from distgcn_tpu.utils.config import Config


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Default: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def param_sharding(mesh: Mesh, params):
    """Replicate biases / small tensors; shard the hidden (output) dim of
    weight matrices over 'model' when it divides evenly."""
    n_model = mesh.shape["model"]

    def spec(x):
        if x.ndim == 2 and x.shape[1] % n_model == 0 and x.shape[1] >= n_model:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def make_sharded_train_step(model, flags: Config, optimizer,
                            mesh: Mesh, feature_mode: str = "gdpg"):
    """Data-parallel (optionally tensor-parallel) batched train step.

    Loss: mean over batch of per-graph RMSE vs labels (masked over real
    nodes) + weight_decay * l2(first layer) — the batched counterpart of the
    reference's per-sample updates; used for high-throughput training. The
    bit-parity sequential trainer lives in rl/train.ReplayTrainer.
    """
    wd = flags.weight_decay

    def loss_fn(params, adj, wts, mask, labels):
        features, supports = build_state_arrays(
            adj, wts, mask > 0, flags.feature_size, flags.max_degree,
            flags.predict, feature_mode)
        out = model.apply({"params": params}, features, supports)
        err = (out[..., :1] - labels) ** 2
        mse = jnp.sum(err[..., 0] * mask, axis=-1) / jnp.maximum(
            jnp.sum(mask, axis=-1), 1.0)
        loss = jnp.mean(jnp.sqrt(mse))
        first_key = "gc1" if "gc1" in params else sorted(params.keys())[0]
        l2 = sum(jnp.sum(v ** 2) / 2.0
                 for v in jax.tree_util.tree_leaves(params[first_key]))
        return loss + wd * l2

    bspec = NamedSharding(mesh, P("data"))
    rspec = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(rspec, rspec, bspec, bspec, bspec, bspec),
        out_shardings=(rspec, rspec, rspec))
    def step(params, opt_state, adj, wts, mask, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, adj, wts, mask,
                                                  labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_sharded_solve(model, flags: Config, mesh: Mesh,
                       feature_mode: str = "gdpg"):
    """Sharded batched inference+LGS pipeline (graphs split over 'data')."""
    from distgcn_tpu.pipeline import make_solve_pipeline

    inner = make_solve_pipeline(model, flags, feature_mode)
    bspec = NamedSharding(mesh, P("data"))
    rspec = NamedSharding(mesh, P())

    @functools.partial(jax.jit,
                       in_shardings=(rspec, bspec, bspec, bspec),
                       out_shardings=(bspec, bspec, bspec))
    def solve(params, adj, wts, mask):
        return inner(params, adj, wts, mask)

    return solve

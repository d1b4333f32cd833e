"""GCN Q-network models.

`ChebGCN` unifies the reference's two Q-net families (they share topology,
differing only in head activation/bias):

- GCN_DQN  (gcn/models.py:441-577, FLAGS-driven): hidden layers
  leaky_relu(0.2), **final layer linear, no bias**. 1-layer variant is a
  single linear GraphConvolution. This is the family of every checkpoint in
  the reference model zoo (scope 'gcn_dqn').
- GCN2_DQN (gcn/models.py:580-717, ctor-driven; used by the GDPG DQNAgent
  with bias=True, mwis_gdpg_call.py:678-688): the ctor act (default
  leaky_relu) applies to **every** layer including the head, bias on every
  layer.

Outputs: `outputs_softmax` is the identity of the head (gcn/models.py:524,
658 — the softmax name is historical); `pred` = argmax over nodes.

`MLP2` re-specifies gcn/models.py:167-298 (graph-blind n-layer dense Q-net,
optional dueling head gcn/models.py:238-241).

`GCNDeepDiver` re-specifies GCN_DEEP_DIVER (gcn/models.py:301-438): deep GCN
emitting 2*diver_num logits interpreted as diver_num two-class heads, trained
with hindsight-min weighted cross-entropy.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn

import numpy as np

from distgcn_tpu.models.layers import (Dense, GraphConvolution,
                                       glorot_uniform, identity,
                                       leaky_relu02)


def skip_zeros_kernel(key, shape, dtype=jnp.float32):
    """The reference's engineered zeros-init skip kernel
    (gcn/models.py:385-396 / :514-520): all zeros except rows 0..W/2-1,
    where row j writes -1 to column 2j and +1 to column 2j+1 (W = output
    width). With diver-style paired logits (class0 at even, class1 at odd
    columns) the head initially emits ±(first W/2 concat features). Odd W
    degenerates to all-zeros exactly as the reference's ``int(W/2)`` +
    ``range(0, W-1, 2)`` indexing does."""
    fi, fo = shape
    w = np.zeros(shape, np.float32)
    half = fo // 2
    for j in range(half):
        w[j, 2 * j] = -1.0
        w[j, 2 * j + 1] = 1.0
    return jnp.asarray(w, dtype)


class SkipHead(nn.Module):
    """Concat-skip output head (gcn/models.py:503-521 and :379-397).

    ``out = dense(concat([features, gcn_out], -1))`` with the kernel init
    selected by `wts_init`: 'random' = glorot uniform (the
    tf.compat.v1.layers.dense default) or 'zeros' = the engineered
    +/-identity kernel (`skip_zeros_kernel`). Bias always present,
    zero-initialized (tf.layers.dense defaults). Output width equals the
    GCN head width (``self.activations[-1].shape[1]``)."""
    wts_init: str = "random"

    @nn.compact
    def __call__(self, features, gcn_out):
        fo = gcn_out.shape[-1]
        sh = jnp.concatenate([features, gcn_out], axis=-1)
        init = glorot_uniform if self.wts_init == "random" else skip_zeros_kernel
        kernel = self.param("kernel", init, (sh.shape[-1], fo))
        bias = self.param("bias", nn.initializers.zeros, (fo,))
        return jnp.matmul(sh, kernel,
                          precision=jax.lax.Precision.HIGHEST) + bias


def dueling_head(out, mask=None):
    """GCN2_DQN/MLP2 dueling combine (gcn/models.py:651-655, :238-241):
    value = node-mean of column 0, advantage = remaining columns centered
    per-column; output = value + advantage. Node means are masked on padded
    batches (the reference runs unpadded single graphs)."""
    if mask is None:
        v = jnp.mean(out[..., 0:1], axis=-2, keepdims=True)
        a = out[..., 1:]
        return v + (a - jnp.mean(a, axis=-2, keepdims=True))
    m = mask.astype(out.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    v = jnp.sum(out[..., 0:1] * m, axis=-2, keepdims=True) / cnt
    a = out[..., 1:]
    return (v + (a - jnp.sum(a * m, axis=-2, keepdims=True) / cnt)) * m


class ChebGCN(nn.Module):
    """Chebyshev-style GCN Q-network over batched dense supports.

    Args mirror the reference configs:
      num_layer, hidden_dim (FLAGS.hidden1), out_dim (FLAGS.diver_num),
      num_supports (1+FLAGS.max_degree), final_act_same (GCN2_DQN) vs linear
      head (GCN_DQN), use_bias, wts_init, dropout.
    """
    num_layer: int = 1
    hidden_dim: int = 32
    out_dim: int = 1
    num_supports: int = 2
    hidden_act: Callable = leaky_relu02
    final_act_same: bool = False   # True = GCN2_DQN head semantics
    use_bias: bool = False
    wts_init: str = "random"
    dropout: float = 0.0
    identity_first: bool = True   # see GraphConvolution.identity_first
    # concat-skip output head (GCN_DQN variant, gcn/models.py:503-521),
    # driven by Config.skip; kernel init follows wts_init
    skip: bool = False
    # dueling combine (GCN2_DQN option, gcn/models.py:651-655). Like MLP2,
    # the head emits out_dim+1 columns so the dueled output keeps width
    # out_dim (the reference's literal [:,0]/[:,1:] slicing shrinks the
    # output by one, degenerate at width 1; the option is dormant there).
    is_dual: bool = False

    @nn.compact
    def __call__(self, x, supports, mask=None, deterministic: bool = True):
        """x: [B, N, F]; supports: [B, S, N, N]; returns [B, N, out_dim]."""
        final_act = self.hidden_act if self.final_act_same else identity
        head_dim = self.out_dim + 1 if self.is_dual else self.out_dim
        if self.num_layer == 1:
            out = GraphConvolution(
                head_dim, self.num_supports, act=final_act,
                use_bias=self.use_bias, wts_init=self.wts_init,
                identity_first=self.identity_first,
                dropout=self.dropout, name="gc1")(x, supports, deterministic)
        else:
            h = GraphConvolution(
                self.hidden_dim, self.num_supports, act=self.hidden_act,
                use_bias=self.use_bias, wts_init=self.wts_init,
                identity_first=self.identity_first,
                dropout=self.dropout, name="gc1")(x, supports, deterministic)
            for i in range(self.num_layer - 2):
                h = GraphConvolution(
                    self.hidden_dim, self.num_supports, act=self.hidden_act,
                    use_bias=self.use_bias, wts_init=self.wts_init,
                    identity_first=self.identity_first,
                    dropout=self.dropout,
                    name=f"gc{i + 2}")(h, supports, deterministic)
            out = GraphConvolution(
                head_dim, self.num_supports, act=final_act,
                use_bias=self.use_bias, wts_init=self.wts_init,
                identity_first=self.identity_first,
                dropout=self.dropout,
                name=f"gc{self.num_layer}")(h, supports, deterministic)
        if self.skip:
            out = SkipHead(wts_init=self.wts_init, name="skip")(x, out)
        if self.is_dual:
            out = dueling_head(out, mask)
        if mask is not None:
            out = out * mask[..., None]
        return out


class MLP2(nn.Module):
    """n-layer dense Q-net (gcn/models.py:167-298). Graph-blind ablation —
    features only. Optional dueling head (gcn/models.py:238-241):
    out = mean(h[:, 0]) + (h[:, 1:] - mean(h[:, 1:], axis=node))."""
    num_layer: int = 2
    hidden_dim: int = 32
    out_dim: int = 1
    act: Callable = leaky_relu02
    is_dual: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = x
        for i in range(self.num_layer - 1):
            h = Dense(self.hidden_dim, act=self.act, use_bias=True,
                      dropout=self.dropout,
                      name=f"dense{i + 1}")(h, deterministic)
        width = self.out_dim + 1 if self.is_dual else self.out_dim
        h = Dense(width, act=identity, use_bias=True, dropout=self.dropout,
                  name=f"dense{self.num_layer}")(h, deterministic)
        if self.is_dual:
            v = jnp.mean(h[..., 0:1], axis=-2, keepdims=True)
            a = h[..., 1:]
            return v + (a - jnp.mean(a, axis=-2, keepdims=True))
        return h


class GCNDeepDiver(nn.Module):
    """GCN_DEEP_DIVER (gcn/models.py:301-438): deep GCN, 2*diver_num logits
    = diver_num two-class heads; hindsight-min loss lives in rl/losses."""
    num_layer: int = 20
    hidden_dim: int = 32
    diver_num: int = 32
    num_supports: int = 2
    dropout: float = 0.0
    # zeros-init residual skip head (gcn/models.py:379-397): with
    # wts_init='zeros' the head starts as +/-(first diver_num concat
    # features) via `skip_zeros_kernel`
    skip: bool = False
    wts_init: str = "random"

    @nn.compact
    def __call__(self, x, supports, mask=None, deterministic: bool = True):
        h = GraphConvolution(self.hidden_dim, self.num_supports,
                             act=jax.nn.relu, dropout=self.dropout,
                             name="gc1")(x, supports, deterministic)
        for i in range(self.num_layer - 2):
            h = GraphConvolution(self.hidden_dim, self.num_supports,
                                 act=jax.nn.relu, dropout=self.dropout,
                                 name=f"gc{i + 2}")(h, supports, deterministic)
        out = GraphConvolution(2 * self.diver_num, self.num_supports,
                               act=identity, dropout=self.dropout,
                               name=f"gc{self.num_layer}")(
            h, supports, deterministic)
        if self.skip:
            out = SkipHead(wts_init=self.wts_init, name="skip")(x, out)
        if mask is not None:
            out = out * mask[..., None]
        return out


def make_model_from_config(cfg, family: str = "gcn_dqn",
                           is_dual: bool = False) -> nn.Module:
    """Build the model matching a reference config.

    family: 'gcn_dqn' (FLAGS family; linear head, no bias — checkpoints in
    model/), 'gcn2_dqn' (GDPG agent family; act on head, bias=True,
    mwis_gdpg_call.py:678-688), 'mlp2', 'deep_diver'.

    `cfg.skip` drives the concat-skip head on the gcn_dqn and deep_diver
    families (the two that have it in the reference); `is_dual` enables the
    dueling combine on the ctor-param families (GCN2_DQN/MLP2 ctor option).
    """
    if family == "gcn_dqn":
        return ChebGCN(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                       out_dim=cfg.diver_num, num_supports=cfg.num_supports,
                       final_act_same=False, use_bias=False,
                       wts_init=cfg.wts_init, dropout=cfg.dropout,
                       skip=cfg.skip)
    if family == "gcn2_dqn":
        return ChebGCN(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                       out_dim=1, num_supports=cfg.num_supports,
                       final_act_same=True, use_bias=True,
                       wts_init=cfg.wts_init, dropout=cfg.dropout,
                       is_dual=is_dual)
    if family == "mlp2":
        return MLP2(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                    out_dim=cfg.diver_num, dropout=cfg.dropout,
                    is_dual=is_dual)
    if family == "deep_diver":
        return GCNDeepDiver(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                            diver_num=cfg.diver_num,
                            num_supports=cfg.num_supports,
                            dropout=cfg.dropout, skip=cfg.skip,
                            wts_init=cfg.wts_init)
    raise ValueError(f"unknown model family {family}")

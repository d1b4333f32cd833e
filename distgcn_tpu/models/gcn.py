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

from distgcn_tpu.models.layers import (Dense, GraphConvolution, identity,
                                       leaky_relu02)


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

    @nn.compact
    def __call__(self, x, supports, mask=None, deterministic: bool = True):
        """x: [B, N, F]; supports: [B, S, N, N]; returns [B, N, out_dim]."""
        final_act = self.hidden_act if self.final_act_same else identity
        if self.num_layer == 1:
            out = GraphConvolution(
                self.out_dim, self.num_supports, act=final_act,
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
                self.out_dim, self.num_supports, act=final_act,
                use_bias=self.use_bias, wts_init=self.wts_init,
                identity_first=self.identity_first,
                dropout=self.dropout,
                name=f"gc{self.num_layer}")(h, supports, deterministic)
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
        if mask is not None:
            out = out * mask[..., None]
        return out


def make_model_from_config(cfg, family: str = "gcn_dqn") -> nn.Module:
    """Build the model matching a reference config.

    family: 'gcn_dqn' (FLAGS family; linear head, no bias — checkpoints in
    model/), 'gcn2_dqn' (GDPG agent family; act on head, bias=True,
    mwis_gdpg_call.py:678-688), 'mlp2', 'deep_diver'.
    """
    if family == "gcn_dqn":
        return ChebGCN(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                       out_dim=cfg.diver_num, num_supports=cfg.num_supports,
                       final_act_same=False, use_bias=False,
                       wts_init=cfg.wts_init, dropout=cfg.dropout)
    if family == "gcn2_dqn":
        return ChebGCN(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                       out_dim=1, num_supports=cfg.num_supports,
                       final_act_same=True, use_bias=True,
                       wts_init=cfg.wts_init, dropout=cfg.dropout)
    if family == "mlp2":
        return MLP2(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                    out_dim=cfg.diver_num, dropout=cfg.dropout)
    if family == "deep_diver":
        return GCNDeepDiver(num_layer=cfg.num_layer, hidden_dim=cfg.hidden1,
                            diver_num=cfg.diver_num,
                            num_supports=cfg.num_supports,
                            dropout=cfg.dropout)
    raise ValueError(f"unknown model family {family}")

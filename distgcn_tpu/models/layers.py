"""Flax layers: multi-support graph convolution and dense layers.

Re-designs the reference's TF1 layers (`gcn/layers.py`) for batched dense
TPU execution:

- `GraphConvolution` (gcn/layers.py:149-216): per support k,
  ``pre_k = X @ W_k`` (MXU), ``out = act(sum_k S_k @ pre_k (+ bias))``.
  Supports arrive as a dense stack [B, S, N, N]; both matmuls are batched
  MXU ops and XLA fuses the sum/activation.
- `Dense` (gcn/layers.py:102-146): y = act(X @ W (+ b)).

Weight naming mirrors the TF1 checkpoint contract
(``graphconvolution_<i>_vars/weights_<k>``, see compat/tf1_ckpt.py) via
params keys ``w_{k}`` / ``bias``.

Initialization parity: 'random' = glorot uniform U(±sqrt(6/(fi+fo)))
(gcn/inits.py:15-19), 'zeros' (gcn/layers.py:178-180).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def glorot_uniform(key, shape, dtype=jnp.float32):
    """gcn/inits.py:15-19 — U(±sqrt(6/(fan_in+fan_out)))."""
    limit = jnp.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def leaky_relu02(x):
    """TF default leaky_relu alpha=0.2 (models use tf.nn.leaky_relu)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def identity(x):
    return x


class GraphConvolution(nn.Module):
    """Multi-support (Chebyshev-style) graph convolution.

    Input  x:        [B, N, Fin]
           supports: [B, S, N, N]
    Output           [B, N, Fout]
    """
    out_dim: int
    num_supports: int
    act: Callable = leaky_relu02
    use_bias: bool = False
    wts_init: str = "random"      # 'random' | 'zeros'
    dropout: float = 0.0
    # Every support builder (simple/chebyshev/plain polynomials,
    # gcn/utils.py:258-340) emits S0 = I, so S0 @ pre == pre exactly; skipping
    # that dense matmul halves the per-layer HBM support traffic, the dominant
    # cost of the deep streaming path. Disable for exotic support stacks.
    identity_first: bool = True

    @nn.compact
    def __call__(self, x, supports, deterministic: bool = True):
        init = glorot_uniform if self.wts_init == "random" else nn.initializers.zeros
        fin = x.shape[-1]
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=False)
        outs = []
        # Precision.HIGHEST: TPU MXU default truncates f32 operands to bf16,
        # breaking activation parity with the TF1 reference (f32 everywhere).
        hp = jax.lax.Precision.HIGHEST
        for k in range(self.num_supports):
            w = self.param(f"w_{k}", init, (fin, self.out_dim))
            pre = jnp.matmul(x, w, precision=hp)           # [B, N, Fout]
            if k == 0 and self.identity_first:
                outs.append(pre)
            else:
                outs.append(jnp.matmul(supports[:, k], pre, precision=hp))
        out = sum(outs)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_dim,))
            out = out + b
        return self.act(out)


class Dense(nn.Module):
    """Plain dense layer (gcn/layers.py:102-146)."""
    out_dim: int
    act: Callable = jax.nn.relu
    use_bias: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.dropout)(x, deterministic=False)
        w = self.param("weights", glorot_uniform, (x.shape[-1], self.out_dim))
        out = jnp.matmul(x, w, precision=jax.lax.Precision.HIGHEST)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (self.out_dim,))
        return self.act(out)


def maxpool_aggregate(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-feature masked neighbor max-aggregation:
    ``out[..., v, f] = max_u x[..., v, u] * y[..., u, f]``.

    Device re-spec of the reference's unused `maxpooling` op
    (gcn/layers.py:35-53, a per-feature loop of diag-matmul + reduce_max;
    its final concat/reshape layout quirk is not reproduced — no reference
    model ever calls the op). Batched: x [..., N, N], y [..., N, F].
    """
    return jnp.max(x[..., :, :, None] * y[..., None, :, :], axis=-2)

"""Sparse matrix x dense matrix (SpMM) for large graphs.

The GCN hot op is ``support @ (X @ W)`` (gcn/layers.py:199-208). For the
reference's conflict graphs (N <= ~1e3) the dense batched path in
models/layers.py is optimal — the MXU eats [B, N, N] matmuls. This module
covers the **large-graph** regime (N ~ 1e4..1e6) where dense N^2 supports
don't fit:

- `BsrMatrix`: block-sparse-row format with MXU-aligned dense blocks
  (default 128x128); built from scipy with optional padding.
- `bsr_spmm_pallas`: Pallas TPU kernel — grid over nonzero blocks, block
  row/col ids scalar-prefetched (PrefetchScalarGridSpec) so the X row-block
  and the output row-block are DMA'd by index map; accumulation across a
  row's blocks happens in VMEM with a first-block init (classic revisited-
  output pattern). One MXU matmul per nonzero block.
- `ell_spmm`: gather-based ELLPACK fallback (CPU/interpret and correctness
  oracle).

Blocks must be sorted by (row, col); `BsrMatrix.from_scipy` guarantees it.

Runtime note: on the axon-tunneled TPU used for CI benches, Mosaic/Pallas
kernels execute but their output buffers cannot be fetched (experimental
runtime limitation — verified with a minimal doubling kernel). `spmm`
therefore dispatches to the XLA ELL path unless DISTGCN_ENABLE_PALLAS=1;
the Pallas kernel is validated in interpret mode and intended for directly
attached TPUs.
"""

import os

PALLAS_ENABLED = os.environ.get("DISTGCN_ENABLE_PALLAS", "0") == "1"

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass
class BsrMatrix:
    """Block-sparse S in BSR: dense [bs, bs] blocks at (row, col) block ids."""
    blk_vals: jnp.ndarray   # [nb, bs, bs]
    blk_rows: jnp.ndarray   # [nb] int32, nondecreasing
    blk_cols: jnp.ndarray   # [nb] int32
    n_rows: int             # padded row count (multiple of bs)
    n_cols: int
    block_size: int

    @classmethod
    def from_scipy(cls, s: sp.spmatrix, block_size: int = 128,
                   dtype=np.float32) -> "BsrMatrix":
        s = sp.csr_matrix(s)
        n, m = s.shape
        bs = block_size
        nr = -(-n // bs) * bs
        nc = -(-m // bs) * bs
        coo = s.tocoo()
        br = coo.row // bs
        bc = coo.col // bs
        keys = br.astype(np.int64) * (nc // bs) + bc
        order = np.argsort(keys, kind="stable")
        uniq, starts = np.unique(keys[order], return_index=True)
        nb = uniq.size
        vals = np.zeros((max(nb, 1), bs, bs), dtype=dtype)
        rows = np.zeros(max(nb, 1), dtype=np.int32)
        cols = np.zeros(max(nb, 1), dtype=np.int32)
        starts = np.append(starts, coo.nnz)
        for i in range(nb):
            sel = order[starts[i]: starts[i + 1]]
            r = int(uniq[i] // (nc // bs))
            c = int(uniq[i] % (nc // bs))
            rows[i] = r
            cols[i] = c
            vals[i, coo.row[sel] - r * bs, coo.col[sel] - c * bs] = \
                coo.data[sel]
        return cls(jnp.asarray(vals), jnp.asarray(rows), jnp.asarray(cols),
                   nr, nc, bs)

    @property
    def num_blocks(self) -> int:
        return self.blk_vals.shape[0]


def _spmm_kernel(blk_rows_ref, blk_cols_ref, vals_ref, x_ref, o_ref):
    """One nonzero block per grid step; init output on each new block-row."""
    i = pl.program_id(0)
    row = blk_rows_ref[i]
    prev = blk_rows_ref[jnp.maximum(i, 1) - 1]
    is_first = jnp.logical_or(i == 0, row != prev)

    @pl.when(is_first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # Precision.HIGHEST: the TPU MXU default truncates f32 inputs to bf16
    # (measured ~1e-2 abs error on O(1) values); full f32 needs 3-pass mode.
    o_ref[...] += jnp.dot(vals_ref[0], x_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret"))
def _bsr_spmm(blk_vals, blk_rows, blk_cols, x, n_rows: int, block_size: int,
              interpret: bool = False):
    nb, bs, _ = blk_vals.shape
    f = x.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((bs, f), lambda i, br, bc: (bc[i], 0)),
        ],
        out_specs=pl.BlockSpec((bs, f), lambda i, br, bc: (br[i], 0)),
    )
    return pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, f), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bs * bs * f,
            bytes_accessed=nb * (bs * bs + 2 * bs * f) * 4,
            transcendentals=0),
    )(blk_rows, blk_cols, blk_vals, x)


def bsr_spmm_pallas(s: BsrMatrix, x: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """y = S @ x with S block-sparse. x: [n_cols, F] (F multiple of 128
    recommended). Returns [n_rows, F].

    NOTE: block-rows of S with no nonzero block produce uninitialized output
    rows; `BsrMatrix.from_scipy` callers should ensure every block-row has at
    least one block (graph Laplacians do: the diagonal), or mask the result.
    """
    if x.shape[0] != s.n_cols:
        x = jnp.pad(x, ((0, s.n_cols - x.shape[0]), (0, 0)))
    return _bsr_spmm(s.blk_vals, s.blk_rows, s.blk_cols, x, s.n_rows,
                     s.block_size, interpret)


# ---------------------------------------------------------------------------
# ELLPACK gather fallback / oracle
# ---------------------------------------------------------------------------

def ell_pack(s: sp.spmatrix, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """cols [N, K], vals [N, K] with K = max row degree (padding: self col,
    zero val)."""
    s = sp.csr_matrix(s)
    n = s.shape[0]
    deg = np.diff(s.indptr)
    k = max(int(deg.max()) if n else 1, 1)
    cols = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, k))
    vals = np.zeros((n, k), dtype=dtype)
    for i in range(n):
        d = deg[i]
        cols[i, :d] = s.indices[s.indptr[i]: s.indptr[i] + d]
        vals[i, :d] = s.data[s.indptr[i]: s.indptr[i] + d]
    return cols, vals


@jax.jit
def ell_spmm(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray
             ) -> jnp.ndarray:
    """y[i] = sum_k vals[i,k] * x[cols[i,k]] — gather-based SpMM."""
    return jnp.einsum("nk,nkf->nf", vals, x[cols])


class SparseSupport:
    """Dispatching sparse support matrix: Pallas BSR on directly-attached
    TPUs (DISTGCN_ENABLE_PALLAS=1), XLA ELL gather otherwise."""

    def __init__(self, s: sp.spmatrix, block_size: int = 128):
        self.use_pallas = PALLAS_ENABLED
        if self.use_pallas:
            self.bsr = BsrMatrix.from_scipy(s, block_size)
        cols, vals = ell_pack(s)
        self.cols = jnp.asarray(cols)
        self.vals = jnp.asarray(vals)
        self.n = s.shape[0]

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            return bsr_spmm_pallas(self.bsr, x)[: self.n]
        return ell_spmm(self.cols, self.vals, x[: self.n])

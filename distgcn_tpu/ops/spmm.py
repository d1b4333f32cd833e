"""Sparse matrix x dense matrix (SpMM) for large graphs.

The GCN hot op is ``support @ (X @ W)`` (gcn/layers.py:199-208). For the
reference's conflict graphs (N <= ~1e3) the dense batched path in
models/layers.py is optimal — the MXU eats [B, N, N] matmuls. This module
covers the **large-graph** regime (N ~ 1e4..1e6) where dense N^2 supports
don't fit:

- `BsrMatrix`: block-sparse-row format with MXU-aligned dense blocks;
  built from scipy with optional padding. Use block_size 512 for graphs
  with locality structure (RCM/geometric ordering) — measured fastest.
- `bsr_spmm_pallas`: Pallas TPU kernel — grid over nonzero blocks, block
  row/col ids scalar-prefetched (PrefetchScalarGridSpec) so the X row-block
  and the output row-block are DMA'd by index map; accumulation across a
  row's blocks happens in VMEM with a first-block init (classic revisited-
  output pattern). One MXU matmul per nonzero block.
- `bsr_spmm_rows`: row-grid variant with manual double-buffered DMA
  (handles empty block-rows; similar throughput).
- `ell_spmm`: gather-based ELLPACK fallback (CPU/interpret and correctness
  oracle). Beware outlier max-degree rows: the gather materializes
  [N, K, F], so cap/normalize degrees first.

Blocks must be sorted by (row, col); `BsrMatrix.from_scipy` guarantees it.

Measured on a v5e chip (N=65536, 3.2M edges, banded/geometric order,
F=128): block-grid bs=512 0.89 Gedge/s f32 (1.01 Gedge/s with bf16-stored
blocks), vs 0.13 Gedge/s for the XLA ELL gather — 6.7-7.9x. Keep graphs
locality-ordered: on an order-free random graph every [bs, bs] block is
nonzero and BSR degenerates to dense (and >100K blocks overflow the SMEM
scalar-prefetch budget).

Pallas dispatch is ON by default on TPU backends (the 2026-08-17 tunnel
fetch limitation is gone; re-verified 2026-08-18). Set
DISTGCN_DISABLE_PALLAS=1 to force the XLA ELL path.
"""

from __future__ import annotations

import os


def pallas_enabled() -> bool:
    if os.environ.get("DISTGCN_DISABLE_PALLAS", "0") == "1":
        return False
    if os.environ.get("DISTGCN_ENABLE_PALLAS", "0") == "1":
        return True
    import jax
    return jax.default_backend() == "tpu"

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CHUNK = 8  # blocks per streamed chunk in the chunk-grid kernels


def _unpack_bits(w, bs: int, dtype):
    """In-kernel bitmap expand: [bs//32, bs] int32 words -> [bs, bs] 0/1.

    Bit (i % 32) of word [i // 32, j] = cell (i, j) (the
    `pack_bits_blocks` layout: rows packed along sublanes so the expand is
    a leading-dim repeat + per-sublane variable shift — both Mosaic-clean;
    a lane-packed layout would need the unsupported lane-repeat relayout).
    """
    t = jnp.repeat(w, 32, axis=0)                        # t[i] = w[i // 32]
    shift = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0) % 32
    return (jax.lax.shift_right_logical(t, shift) & 1).astype(dtype)


def pack_bits_blocks(blk: np.ndarray) -> np.ndarray:
    """Host pack: [nb, bs, bs] 0/1 blocks -> [nb, bs//32, bs] int32 bitmap
    blocks (1 bit per cell — 8x less HBM stream + footprint than int8).
    Layout matches `_unpack_bits`."""
    nb, bs, _ = blk.shape
    assert bs % 32 == 0, bs
    b = (np.asarray(blk) != 0).astype(np.uint32).reshape(nb, bs // 32, 32,
                                                         bs)
    shifts = np.arange(32, dtype=np.uint32)[None, None, :, None]
    return np.bitwise_or.reduce(b << shifts, axis=2).view(np.int32)


@dataclass
class BsrMatrix:
    """Block-sparse S in BSR: dense [bs, bs] blocks at (row, col) block ids.

    The block arrays are padded to a multiple of `_CHUNK` with all-zero
    blocks (duplicating the last real block's ids) so chunked kernels can
    stream fixed-size chunks; `nb_real` is the unpadded count.

    ``bitmap=True``: blk_vals holds [nb, bs//32, bs] int32 BITMAP blocks
    (`pack_bits_blocks` layout, 0/1 structure only) — the bandwidth format
    for structure-stream kernels (1 bit/cell; in-band densities of ~2% on
    RCM-ordered conflict graphs make int8 pay ~50x zeros, VERDICT r3 weak
    #6)."""
    blk_vals: jnp.ndarray   # [nb, bs, bs] (or [nb, bs//32, bs] if bitmap)
    blk_rows: jnp.ndarray   # [nb] int32, nondecreasing
    blk_cols: jnp.ndarray   # [nb] int32
    n_rows: int             # padded row count (multiple of bs)
    n_cols: int
    block_size: int
    nb_real: int = 0        # real (pre-padding) block count
    bitmap: bool = False

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
        nbc = nc // bs
        keys = br.astype(np.int64) * nbc + bc
        # every block-row gets at least one (zero) block so the revisited-
        # output kernels always initialize their output rows — no
        # empty-block-row caveat for callers
        empty_rows = np.setdiff1d(np.arange(nr // bs, dtype=np.int64),
                                  np.unique(br))
        keys = np.concatenate([keys, empty_rows * nbc])
        uniq, inv = np.unique(keys, return_inverse=True)
        inv = inv[: coo.nnz]
        nb = uniq.size
        # pad the block count to a multiple of _CHUNK so the chunk-grid
        # kernels can stream fixed-size chunks; padding blocks are all-zero
        # (SpMM adds 0, neighbor-max sees no edges) and carry the last real
        # block's row id so blk_rows stays nondecreasing
        nb_pad = max(-(-max(nb, 1) // _CHUNK) * _CHUNK, _CHUNK)
        vals = np.zeros((nb_pad, bs, bs), dtype=dtype)
        rows = np.zeros(nb_pad, dtype=np.int32)
        cols = np.zeros(nb_pad, dtype=np.int32)
        if nb:
            rows[:nb] = (uniq // nbc).astype(np.int32)
            cols[:nb] = (uniq % nbc).astype(np.int32)
            rows[nb:] = rows[nb - 1]
            cols[nb:] = cols[nb - 1]
            vals[inv, coo.row % bs, coo.col % bs] = coo.data
        return cls(jnp.asarray(vals), jnp.asarray(rows), jnp.asarray(cols),
                   nr, nc, bs, nb_real=nb)

    @property
    def num_blocks(self) -> int:
        return self.blk_vals.shape[0]


def _spmm_kernel(blk_rows_ref, blk_cols_ref, vals_ref, x_ref, o_ref, *,
                 precision):
    """One nonzero block per grid step; init output on each new block-row."""
    i = pl.program_id(0)
    row = blk_rows_ref[i]
    prev = blk_rows_ref[jnp.maximum(i, 1) - 1]
    is_first = jnp.logical_or(i == 0, row != prev)

    @pl.when(is_first)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # Precision.HIGHEST (default): the TPU MXU truncates f32 inputs to bf16
    # (measured ~1e-2 abs error on O(1) values); full f32 needs 3-pass mode.
    o_ref[...] += jnp.dot(vals_ref[0], x_ref[...],
                          preferred_element_type=jnp.float32,
                          precision=precision)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret", "precision"))
def _bsr_spmm(blk_vals, blk_rows, blk_cols, x, n_rows: int, block_size: int,
              interpret: bool = False, precision=jax.lax.Precision.HIGHEST):
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
        functools.partial(_spmm_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, f), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bs * bs * f,
            bytes_accessed=nb * (bs * bs + 2 * bs * f) * 4,
            transcendentals=0),
    )(blk_rows, blk_cols, blk_vals, x)


def _spmm_row_kernel(row_ptr_ref, blk_cols_ref, vals_hbm, x_hbm, o_ref,
                     vbuf, xbuf, acc, sem_v, sem_x, *, bs, precision,
                     bitmap=False):
    """One block-ROW per grid step; blocks of the row streamed HBM->VMEM
    with double-buffered DMA overlapped against the MXU accumulation.
    Empty block-rows produce zero output (the block-grid kernel left them
    uninitialized)."""
    r = pl.program_id(0)
    start = row_ptr_ref[r]
    nblk = row_ptr_ref[r + 1] - start

    def dma_v(slot, k):
        return pltpu.make_async_copy(vals_hbm.at[start + k], vbuf.at[slot],
                                     sem_v.at[slot])

    def dma_x(slot, k):
        c = blk_cols_ref[start + k]
        return pltpu.make_async_copy(x_hbm.at[pl.ds(c * bs, bs), :],
                                     xbuf.at[slot], sem_x.at[slot])

    @pl.when(nblk > 0)
    def _():
        dma_v(0, 0).start()
        dma_x(0, 0).start()

    acc[...] = jnp.zeros_like(acc)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < nblk)
        def _():
            dma_v(nxt, k + 1).start()
            dma_x(nxt, k + 1).start()

        dma_v(slot, k).wait()
        dma_x(slot, k).wait()
        v = (_unpack_bits(vbuf[slot], bs, jnp.float32) if bitmap
             else vbuf[slot].astype(jnp.float32))
        acc[...] += jnp.dot(v, xbuf[slot],
                            preferred_element_type=jnp.float32,
                            precision=precision)
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)
    o_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret", "precision",
                                             "bitmap"))
def _bsr_spmm_rows(blk_vals, row_ptr, blk_cols, x, n_rows: int,
                   block_size: int, interpret: bool = False,
                   precision=jax.lax.Precision.HIGHEST,
                   bitmap: bool = False):
    nb = blk_vals.shape[0]
    bs = block_size
    f = x.shape[1]
    nr = n_rows // bs
    vshape = (2, bs // 32, bs) if bitmap else (2, bs, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # vals stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
        ],
        out_specs=pl.BlockSpec((bs, f), lambda r, rp, bc: (r, 0)),
        scratch_shapes=[
            pltpu.VMEM(vshape, blk_vals.dtype),   # bf16/int8/bitmap storage
            pltpu.VMEM((2, bs, f), jnp.float32),
            pltpu.VMEM((bs, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap else bs * bs * 4
    return pl.pallas_call(
        functools.partial(_spmm_row_kernel, bs=bs, precision=precision,
                          bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, f), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bs * bs * f,
            bytes_accessed=nb * (blk_bytes + 2 * bs * f * 4),
            transcendentals=0),
    )(row_ptr, blk_cols, blk_vals, x)


def bsr_row_ptr(s: BsrMatrix) -> jnp.ndarray:
    """CSR-style block-row pointer [R+1] from sorted blk_rows."""
    nr = s.n_rows // s.block_size
    counts = np.bincount(np.asarray(s.blk_rows), minlength=nr)
    return jnp.asarray(np.concatenate([[0], np.cumsum(counts)])
                       .astype(np.int32))


def bsr_spmm_rows(s: BsrMatrix, x: jnp.ndarray,
                  row_ptr: Optional[jnp.ndarray] = None,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """y = S @ x — row-grid double-buffered kernel (preferred on TPU).

    ~3x the block-grid kernel's throughput: the output block is written once
    per row from a VMEM accumulator, and vals/x blocks are prefetched with
    manual async DMA two deep. Pass a precomputed `row_ptr` (`bsr_row_ptr`)
    to amortize host work across calls.
    """
    if row_ptr is None:
        row_ptr = bsr_row_ptr(s)
    if x.shape[0] != s.n_cols:
        x = jnp.pad(x, ((0, s.n_cols - x.shape[0]), (0, 0)))
    return _bsr_spmm_rows(s.blk_vals, row_ptr, s.blk_cols, x, s.n_rows,
                          s.block_size, interpret, precision,
                          bitmap=s.bitmap)


def bsr_spmm_pallas(s: BsrMatrix, x: jnp.ndarray,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """y = S @ x with S block-sparse. x: [n_cols, F] (F multiple of 128
    recommended). Returns [n_rows, F].

    NOTE: block-rows of S with no nonzero block produce uninitialized output
    rows; `BsrMatrix.from_scipy` callers should ensure every block-row has at
    least one block (graph Laplacians do: the diagonal), or mask the result.
    """
    if s.bitmap:
        raise ValueError("bsr_spmm_pallas has no bitmap path — use "
                         "bsr_spmm_rows for bitmap-packed matrices")
    if x.shape[0] != s.n_cols:
        x = jnp.pad(x, ((0, s.n_cols - x.shape[0]), (0, 0)))
    return _bsr_spmm(s.blk_vals, s.blk_rows, s.blk_cols, x, s.n_rows,
                     s.block_size, interpret, precision)


def _nbr_max_kernel(blk_rows_ref, blk_cols_ref, vals_ref, x_ref, o_ref):
    """Per nonzero block: out[r] = max over cols j with block[r,j] != 0 of
    x[j]; max-accumulated across a row's blocks (same revisited-output
    pattern as `_spmm_kernel`). VPU select + lane reduction, no MXU."""
    i = pl.program_id(0)
    row = blk_rows_ref[i]
    prev = blk_rows_ref[jnp.maximum(i, 1) - 1]
    is_first = jnp.logical_or(i == 0, row != prev)

    @pl.when(is_first)
    def _():
        o_ref[...] = jnp.full_like(o_ref, _NEG_HUGE)

    # arithmetic select: an i1 mask broadcast into the select relayouts the
    # bool vector, which Mosaic rejects (see ops/lgs_pallas.py notes) — cast
    # the edge indicator to f32 immediately instead
    ind = (vals_ref[0] != 0).astype(jnp.float32)          # [bs, bs]
    cand = ind * x_ref[0][None, :] + (1.0 - ind) * _NEG_HUGE
    bm = jnp.max(cand, axis=1)                            # [bs] per-row max
    # output block is [1, 8, bs] (Mosaic needs >=8 sublanes); broadcast the
    # row-max across the 8 sublanes, caller reads sublane 0
    o_ref[0] = jnp.maximum(o_ref[0], bm[None, :])


_NEG_HUGE = -3.0e38


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret"))
def _bsr_nbr_max(blk_vals, blk_rows, blk_cols, x, n_rows: int,
                 block_size: int, interpret: bool = False):
    """Neighbor-max over a BSR pattern: y[i] = max_{j: S[i,j]!=0} x[j]
    (no-neighbor rows get a very negative sentinel). x: [n_cols] f32.

    This is the large-graph LGS round primitive: XLA's gather on TPU runs
    ~0.01 Gelem/s for the ELL formulation; streaming the same BSR blocks the
    SpMM uses turns each round into two bandwidth-bound Pallas passes.
    """
    nb, bs, _ = blk_vals.shape
    nr = n_rows // bs
    # x must cover every referenced column block: an under-padded x would
    # produce silent out-of-bounds block reads via the bc[i] BlockSpec
    # (bsr_neighbor_max pads; this guards direct internal callers)
    assert x.shape[0] % bs == 0, (x.shape, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, br, bc: (i, 0, 0)),
            pl.BlockSpec((1, bs), lambda i, br, bc: (0, bc[i])),
        ],
        out_specs=pl.BlockSpec((1, 8, bs), lambda i, br, bc: (br[i], 0, 0)),
    )
    out = pl.pallas_call(
        _nbr_max_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr, 8, bs), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nb * bs * bs,
            bytes_accessed=nb * (bs * bs * blk_vals.dtype.itemsize
                                 + 2 * bs * 4),
            transcendentals=0),
    )(blk_rows, blk_cols, blk_vals, x.reshape(1, x.shape[0]))
    return out[:, 0, :].reshape(n_rows)


def bsr_neighbor_max(s: BsrMatrix, x: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """y[i] = max over structural neighbors j of x[j] (see `_bsr_nbr_max`).

    NOTE (same caveat as `bsr_spmm_pallas`): block-rows with no nonzero
    block keep uninitialized output — graph Laplacian/adjacency callers pad
    every block-row or mask the result.
    """
    if s.bitmap:
        raise ValueError("bsr_neighbor_max has no bitmap path — use the "
                         "row/chunk/panel-grid kernels (large.py dispatch) "
                         "for bitmap-packed matrices")
    if x.shape[0] != s.n_cols:
        x = jnp.pad(x, (0, s.n_cols - x.shape[0]),
                    constant_values=_NEG_HUGE)
    return _bsr_nbr_max(s.blk_vals, s.blk_rows, s.blk_cols, x, s.n_rows,
                        s.block_size, interpret)


def _nbr_max_row_kernel(row_ptr_ref, blk_cols_ref, vals_hbm, x_hbm, o_ref,
                        vbuf, xbuf, acc, sem_v, sem_x, *, bs, bitmap=False):
    """Row-grid neighbor-max: one block-ROW per grid step, blocks streamed
    with double-buffered DMA (mirrors `_spmm_row_kernel`). Rows with no
    blocks emit the -HUGE sentinel — safe for per-panel max-accumulation
    (the block-grid `_nbr_max_kernel` leaves such rows uninitialized)."""
    r = pl.program_id(0)
    start = row_ptr_ref[r]
    nblk = row_ptr_ref[r + 1] - start

    def dma_v(slot, k):
        return pltpu.make_async_copy(vals_hbm.at[start + k], vbuf.at[slot],
                                     sem_v.at[slot])

    def dma_x(slot, k):
        c = blk_cols_ref[start + k]
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(c * bs, bs)],
                                     xbuf.at[slot], sem_x.at[slot])

    @pl.when(nblk > 0)
    def _():
        dma_v(0, 0).start()
        dma_x(0, 0).start()

    acc[...] = jnp.full_like(acc, _NEG_HUGE)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < nblk)
        def _():
            dma_v(nxt, k + 1).start()
            dma_x(nxt, k + 1).start()

        dma_v(slot, k).wait()
        dma_x(slot, k).wait()
        ind = (_unpack_bits(vbuf[slot], bs, jnp.float32) if bitmap
               else (vbuf[slot] != 0).astype(jnp.float32))
        cand = ind * xbuf[slot] + (1.0 - ind) * _NEG_HUGE
        bm = jnp.max(cand, axis=1)                       # [bs] per-row max
        acc[...] = jnp.maximum(acc[...], bm[None, :])
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)
    o_ref[0] = acc[...]


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret", "bitmap"))
def _bsr_nbr_max_rows(blk_vals, row_ptr, blk_cols, x, n_rows: int,
                      block_size: int, interpret: bool = False,
                      bitmap: bool = False):
    """Row-grid `_bsr_nbr_max` (empty rows -> sentinel, never uninit).
    x: [n_cols] f32; returns [n_rows] f32."""
    nb = blk_vals.shape[0]
    bs = block_size
    nr = n_rows // bs
    n_cols = x.shape[0]
    vshape = (2, bs // 32, bs) if bitmap else (2, bs, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # vals stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),      # x stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 8, bs), lambda r, rp, bc: (r, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(vshape, blk_vals.dtype),
            pltpu.VMEM((2, 1, bs), jnp.float32),
            pltpu.VMEM((8, bs), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap \
        else bs * bs * blk_vals.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_nbr_max_row_kernel, bs=bs, bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr, 8, bs), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nb * bs * bs,
            bytes_accessed=nb * (blk_bytes + 2 * bs * 4),
            transcendentals=0),
    )(row_ptr, blk_cols, blk_vals, x.reshape(1, n_cols))
    return out[:, 0, :].reshape(n_rows)


_I32_SENT = -(2 ** 31) + 1


def _nbr_max_row_kernel_i32(row_ptr_ref, blk_cols_ref, vals_hbm, x_hbm,
                            o_ref, vbuf, xbuf, acc, sem_v, sem_x, *, bs,
                            bitmap=False):
    """Row-grid neighbor-max over INT32 payloads (LGS rank transport for
    n >= 2^24, where f32 loses integer exactness — VERDICT r2 weak #3).
    Requires int8 0/1 STRUCTURE blocks (cast straight to i32; no int8
    compare — Mosaic). Mirrors `_nbr_max_row_kernel` otherwise."""
    r = pl.program_id(0)
    start = row_ptr_ref[r]
    nblk = row_ptr_ref[r + 1] - start

    def dma_v(slot, k):
        return pltpu.make_async_copy(vals_hbm.at[start + k], vbuf.at[slot],
                                     sem_v.at[slot])

    def dma_x(slot, k):
        c = blk_cols_ref[start + k]
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(c * bs, bs)],
                                     xbuf.at[slot], sem_x.at[slot])

    @pl.when(nblk > 0)
    def _():
        dma_v(0, 0).start()
        dma_x(0, 0).start()

    acc[...] = jnp.full_like(acc, _I32_SENT)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < nblk)
        def _():
            dma_v(nxt, k + 1).start()
            dma_x(nxt, k + 1).start()

        dma_v(slot, k).wait()
        dma_x(slot, k).wait()
        ind = (_unpack_bits(vbuf[slot], bs, jnp.int32) if bitmap
               else vbuf[slot].astype(jnp.int32))        # 0/1 structure
        cand = ind * xbuf[slot] + (1 - ind) * _I32_SENT
        bm = jnp.max(cand, axis=1)                       # [bs] per-row max
        acc[...] = jnp.maximum(acc[...], bm[None, :])
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)
    o_ref[0] = acc[...]


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret", "bitmap"))
def _bsr_nbr_max_rows_i32(blk_ind, row_ptr, blk_cols, x, n_rows: int,
                          block_size: int, interpret: bool = False,
                          bitmap: bool = False):
    """Row-grid neighbor-max, int32 x / int8-or-bitmap 0/1 structure
    blocks. x: [n_cols] int32; returns [n_rows] int32 (no-neighbor rows
    get the int sentinel)."""
    nb = blk_ind.shape[0]
    bs = block_size
    nr = n_rows // bs
    n_cols = x.shape[0]
    vshape = (2, bs // 32, bs) if bitmap else (2, bs, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, bs), lambda r, rp, bc: (r, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM(vshape, blk_ind.dtype),
            pltpu.VMEM((2, 1, bs), jnp.int32),
            pltpu.VMEM((8, bs), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap \
        else bs * bs * blk_ind.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_nbr_max_row_kernel_i32, bs=bs, bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr, 8, bs), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nb * bs * bs,
            bytes_accessed=nb * (blk_bytes + 2 * bs * 4),
            transcendentals=0),
    )(row_ptr, blk_cols, blk_ind, x.reshape(1, n_cols))
    return out[:, 0, :].reshape(n_rows)


def _nbr_max_chunk_kernel(blk_rows_ref, blk_cols_ref, ind_hbm, x_ref,
                          o_ref, ibuf, sem, *, bs, chunk, nchunks,
                          bitmap=False):
    """Chunk-grid neighbor-max: `chunk` blocks per grid step, streamed
    HBM->VMEM in [chunk, bs, bs] slabs with manual double-buffered DMA.
    Streams 0/1 INDICATOR blocks (int8 — structure is all neighbor-max
    needs, so traffic is halved vs bf16 value blocks and quartered vs f32).
    The blocks stay `memory_space=ANY` (HBM): routing them through a
    BlockSpec pipeline makes XLA retile the whole array into the kernel's
    VMEM layout on every program entry — a fixed ~32 ms for a 198 MB int8
    array, dwarfing the 0.3 ms/pass marginal cost. x and the whole output
    live in VMEM for the entire pass: no per-block x DMA, no
    revisited-output HBM writes. Zero padding blocks
    (BsrMatrix.from_scipy) are no-ops here."""
    i = pl.program_id(0)

    def dma(slot, c):
        return pltpu.make_async_copy(ind_hbm.at[pl.ds(c * chunk, chunk)],
                                     ibuf.at[slot], sem.at[slot])

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.full_like(o_ref, _NEG_HUGE)
        dma(0, 0).start()

    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    @pl.when(i + 1 < nchunks)
    def _():
        dma(nxt, i + 1).start()

    dma(slot, i).wait()
    for j in range(chunk):
        b = i * chunk + j
        row = blk_rows_ref[b]
        col = blk_cols_ref[b]
        # blocks are 0/1; cast straight to f32 (no int8 compare — Mosaic)
        ind = (_unpack_bits(ibuf[slot, j], bs, jnp.float32) if bitmap
               else ibuf[slot, j].astype(jnp.float32))        # [bs, bs]
        xs = x_ref[:, pl.ds(col * bs, bs)]                    # [1, bs]
        cand = ind * xs + (1.0 - ind) * _NEG_HUGE
        bm = jnp.max(cand, axis=1)                            # [bs]
        cur = o_ref[row]                                      # [8, bs]
        o_ref[row] = jnp.maximum(cur, bm[None, :])


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "interpret", "bitmap"))
def _bsr_nbr_max_chunks(blk_ind, blk_rows, blk_cols, x, n_rows: int,
                        block_size: int, interpret: bool = False,
                        bitmap: bool = False):
    """Chunk-grid `_bsr_nbr_max` over 0/1 indicator blocks, int8 or
    bitmap-packed (built by `large.build_large_graph` /
    `parallel.large_sharded`). Requires the block count padded to a
    multiple of `_CHUNK` (BsrMatrix.from_scipy layout) and x + output
    small enough for VMEM — see `_nbr_max_fits_vmem`. x: [n_cols] f32."""
    nb = blk_ind.shape[0]
    bs = block_size
    nr = n_rows // bs
    n_cols = x.shape[0]
    nchunks = nb // _CHUNK
    ishape = (2, _CHUNK, bs // 32, bs) if bitmap else (2, _CHUNK, bs, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # blocks stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x resident all pass
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(ishape, blk_ind.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap \
        else bs * bs * blk_ind.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_nbr_max_chunk_kernel, bs=bs, chunk=_CHUNK,
                          nchunks=nchunks, bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr, 8, bs), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nb * bs * bs,
            bytes_accessed=nb * blk_bytes,
            transcendentals=0),
    )(blk_rows, blk_cols, blk_ind, x.reshape(1, n_cols))
    return out[:, 0, :].reshape(n_rows)


@dataclass
class BsrPanels:
    """Panel-aligned int8 block stream + metadata for the panel kernels.

    Blocks stay sorted by (row, col) but each PANEL (a slab of `panel_rows`
    consecutive block-rows) is padded with all-zero blocks to a multiple of
    `_CHUNK`, so a panel-grid kernel can stream whole chunks that never
    straddle a panel boundary. Padding blocks carry the panel's last real
    block-row id and its window-start column — no-ops for SpMM (add 0) and
    neighbor-max (no edges), and `bsr_row_ptr`/the row-grid kernels work on
    the stream unchanged, so ONE device copy serves every kernel.
    """
    bsr: BsrMatrix
    panel_ptr: jnp.ndarray    # [n_panels+1] int32, in _CHUNK units
    win_start: jnp.ndarray    # [n_panels] int32, block-col window start
    panel_rows: int           # block-rows per panel
    win_blocks: int           # W: window width in block-cols
    n_panels: int


def panel_window_width(s: sp.spmatrix, block_size: int,
                       panel_rows: int) -> int:
    """W that `bsr_panels(s, block_size, panel_rows)` would produce —
    without building (or packing) the panels. Used by the panel-height
    auto-tuner (`large.build_large_graph`): taller panels cut the x-window
    re-read factor (n_panels * W) but widen W, so the caller probes several
    heights against the VMEM fit checks and builds once."""
    s = sp.csr_matrix(s)
    bs = block_size
    nr_b = -(-s.shape[0] // bs)
    nc_b = -(-s.shape[1] // bs)
    n_panels = -(-nr_b // panel_rows)
    coo = s.tocoo()
    keys = (coo.row // bs).astype(np.int64) * nc_b + coo.col // bs
    uniq = np.unique(keys)
    rows_u = (uniq // nc_b).astype(np.int64)
    cols_u = (uniq % nc_b).astype(np.int64)
    pan_of = rows_u // panel_rows
    pids, starts = np.unique(pan_of, return_index=True)
    min_c = np.minimum(np.minimum.reduceat(cols_u, starts),
                       np.minimum(pids * panel_rows, nc_b - 1))
    max_c = np.maximum(np.maximum.reduceat(cols_u, starts),
                       np.minimum((pids + 1) * panel_rows, nc_b) - 1)
    # empty panels (no blocks) still cover their own row range
    w_own = panel_rows + 1
    return int(max((max_c - min_c + 1).max(), min(w_own, nc_b)))


def _count_touched_blocks(s: sp.spmatrix, block_size: int) -> int:
    """Number of distinct nonzero [bs, bs] blocks (pre-padding) — lets the
    panel-height auto-tuner run fit checks before any panels are built."""
    s = sp.csr_matrix(s)
    coo = s.tocoo()
    nc_b = -(-s.shape[1] // block_size)
    keys = (coo.row // block_size).astype(np.int64) * nc_b \
        + coo.col // block_size
    return int(np.unique(keys).size)


def panel_gather_width(s: sp.spmatrix, block_size: int,
                       panel_rows: int) -> int:
    """Wg that `panel_gather_meta` would produce for panels of this height
    — without building the panels (the gather analog of
    `panel_window_width`, for the panel-height auto-tuner)."""
    s = sp.csr_matrix(s)
    bs = block_size
    nr_b = -(-s.shape[0] // bs)
    nc_b = -(-s.shape[1] // bs)
    n_panels = -(-nr_b // panel_rows)
    coo = s.tocoo()
    keys = (coo.row // bs).astype(np.int64) * nc_b + coo.col // bs
    uniq = np.unique(keys)
    pan_of = (uniq // nc_b) // panel_rows
    pairs = pan_of * nc_b + uniq % nc_b
    own = []
    for p in range(n_panels):
        rng = np.arange(p * panel_rows, min((p + 1) * panel_rows, nc_b))
        own.append(p * nc_b + rng)
    pairs = np.unique(np.concatenate([pairs] + own))
    counts = np.bincount((pairs // nc_b).astype(np.int64),
                         minlength=n_panels)
    return int(-(-counts.max() // 4) * 4)


def panel_gather_meta(pans: "BsrPanels", nc_b: int):
    """Gather-window metadata for the fused gwin kernel
    (`ops.cheb_fused._fused_cheb_layer_gwin`): per panel the DISTINCT
    block-columns (plus the panel's own row range for the epilogue),
    padded to a common width Wg by repeating the last column.

    Returns (wlist [n_panels, Wg] int32, gofs [nb] int32 block -> window
    slot, own_ofs [n_panels] int32 window slot of the panel's first own
    row-col, Wg). Wg <= win_blocks always (distinct ⊆ contiguous span);
    on serpentine-ordered graphs a panel's columns are <=3 contiguous
    runs, so Wg can be far below the span (measured 52 vs 81 at N=262k).
    """
    blk_rows = np.asarray(pans.bsr.blk_rows)
    blk_cols_g = np.asarray(pans.bsr.blk_cols)
    panel_ptr = np.asarray(pans.panel_ptr)
    pr = pans.panel_rows
    n_panels = pans.n_panels
    cols_lists = []
    for p in range(n_panels):
        b0, b1 = panel_ptr[p] * _CHUNK, panel_ptr[p + 1] * _CHUNK
        own = np.arange(p * pr, min((p + 1) * pr, nc_b))
        cols_lists.append(np.unique(np.concatenate(
            [blk_cols_g[b0:b1], own])))
    wg = -(-max(len(c) for c in cols_lists) // 4) * 4
    wlist = np.zeros((n_panels, wg), np.int32)
    gofs = np.zeros(blk_rows.size, np.int32)
    own_ofs = np.zeros(n_panels, np.int32)
    for p, cols in enumerate(cols_lists):
        wlist[p, : len(cols)] = cols
        wlist[p, len(cols):] = cols[-1]
        b0, b1 = panel_ptr[p] * _CHUNK, panel_ptr[p + 1] * _CHUNK
        gofs[b0:b1] = np.searchsorted(cols, blk_cols_g[b0:b1])
        # own row range is contiguous ints, hence contiguous in sorted cols
        own_ofs[p] = np.searchsorted(cols, p * pr)
    return (jnp.asarray(wlist), jnp.asarray(gofs), jnp.asarray(own_ofs),
            int(wg))


def bsr_panels(s: sp.spmatrix, block_size: int = 512,
               panel_rows: int = 4, dtype=np.int8) -> BsrPanels:
    """Build a panel-aligned `BsrMatrix` (see `BsrPanels`) from scipy.

    The per-panel column window [win_start, win_start+W) must cover every
    block of the panel; W = the max per-panel column span, so keep the graph
    locality-ordered (RCM) — on an order-free graph W degenerates to the
    full width and the panel kernel loses its point (the caller should fall
    back to the streaming kernels).
    """
    s = sp.csr_matrix(s)
    n, m = s.shape
    bs = block_size
    nr_b = -(-n // bs)
    nc_b = -(-m // bs)
    n_panels = -(-nr_b // panel_rows)
    coo = s.tocoo()
    br = coo.row // bs
    bc = coo.col // bs
    keys = br.astype(np.int64) * nc_b + bc
    empty = np.setdiff1d(np.arange(nr_b, dtype=np.int64), np.unique(br))
    # placeholder blocks for empty block-rows sit on the DIAGONAL (inside
    # the panel's own-row window), not at column 0 — a col-0 placeholder
    # dragged min_c to 0 and degenerated the window to full width on any
    # graph whose padding produced an empty block-row (review r5 #1)
    empty_keys = empty * nc_b + np.minimum(empty, nc_b - 1)
    uniq, inv = np.unique(np.concatenate([keys, empty_keys]),
                          return_inverse=True)
    inv = inv[: coo.nnz]
    rows_u = (uniq // nc_b).astype(np.int32)
    cols_u = (uniq % nc_b).astype(np.int32)
    pan_of = rows_u // panel_rows
    counts = np.bincount(pan_of, minlength=n_panels)
    assert (counts > 0).all()   # every block-row has >= 1 block
    padded = -(-counts // _CHUNK) * _CHUNK
    starts1 = np.concatenate([[0], np.cumsum(counts)])[:-1]
    starts2 = np.concatenate([[0], np.cumsum(padded)])[:-1]
    nb2 = int(padded.sum())
    # per-panel column window; extended to cover the panel's OWN block-row
    # range so panel kernels can read the row slab (x_row, r_row) straight
    # from the resident window (fused epilogue, ops/cheb_fused.py)
    pids = np.arange(n_panels)
    min_c = np.minimum(np.minimum.reduceat(cols_u, starts1),
                       np.minimum(pids * panel_rows, nc_b - 1))
    max_c = np.maximum(np.maximum.reduceat(cols_u, starts1),
                       np.minimum((pids + 1) * panel_rows, nc_b) - 1)
    w = int((max_c - min_c + 1).max())
    ws = np.clip(min_c, 0, max(nc_b - w, 0)).astype(np.int32)
    # padding blocks: panel's last real row, window-start col
    blk_rows = np.repeat(rows_u[starts1 + counts - 1].astype(np.int32),
                         padded)
    blk_cols = np.repeat(ws, padded)
    pos2 = (starts2[pan_of] + (np.arange(uniq.size) - starts1[pan_of])
            ).astype(np.int64)
    blk_rows[pos2] = rows_u
    blk_cols[pos2] = cols_u
    if dtype == "bits":
        # pack straight from COO — the dense [nb, bs, bs] int8 stream is
        # never materialized (at N=262k it would be ~0.9 GB host-side)
        assert bs % 32 == 0, bs
        vals = np.zeros((nb2, bs // 32, bs), np.uint32)
        if coo.nnz:
            ri = coo.row % bs
            np.bitwise_or.at(
                vals, (pos2[inv], ri // 32, coo.col % bs),
                np.uint32(1) << (ri % 32).astype(np.uint32))
        vals = vals.view(np.int32)
        bitmap = True
    else:
        vals = np.zeros((nb2, bs, bs), dtype)
        if coo.nnz:
            vals[pos2[inv], coo.row % bs, coo.col % bs] = coo.data
        bitmap = False
    bsr = BsrMatrix(jnp.asarray(vals), jnp.asarray(blk_rows),
                    jnp.asarray(blk_cols), nr_b * bs, nc_b * bs, bs,
                    nb_real=int(uniq.size), bitmap=bitmap)
    panel_ptr = jnp.asarray(np.concatenate(
        [[0], np.cumsum(padded // _CHUNK)]).astype(np.int32))
    return BsrPanels(bsr=bsr, panel_ptr=panel_ptr, win_start=jnp.asarray(ws),
                     panel_rows=panel_rows, win_blocks=w, n_panels=n_panels)


def _nbr_max_panel_kernel(panel_ptr_ref, win_start_ref, blk_rows_ref,
                          blk_cols_ref, ind_hbm, x_hbm, o_ref, xwin, ibuf,
                          sem_x, sem_i, *, bs, chunk, panel_rows,
                          win_blocks, bitmap=False):
    """Panel-grid neighbor-max: one panel of block-rows per grid step.
    The panel's x window and output slab are VMEM-resident; int8 indicator
    chunks stream double-buffered — same per-byte cost as the fully
    VMEM-resident `_nbr_max_chunk_kernel` but with VMEM usage independent
    of N (fixes the N=262k fallback, VERDICT r2 weak #2)."""
    p = pl.program_id(0)
    c0 = panel_ptr_ref[p]
    nch = panel_ptr_ref[p + 1] - c0
    ws = win_start_ref[p]
    xd = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(ws * bs, win_blocks * bs)], xwin, sem_x)
    xd.start()

    def dma(slot, c):
        return pltpu.make_async_copy(
            ind_hbm.at[pl.ds((c0 + c) * chunk, chunk)], ibuf.at[slot],
            sem_i.at[slot])

    dma(0, 0).start()           # every panel has >= 1 chunk (bsr_panels)
    o_ref[...] = jnp.full_like(o_ref, _NEG_HUGE)
    xd.wait()

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(nxt, c + 1).start()

        dma(slot, c).wait()
        for j in range(chunk):
            b = (c0 + c) * chunk + j
            row = blk_rows_ref[b] - p * panel_rows
            col = blk_cols_ref[b] - ws
            ind = (_unpack_bits(ibuf[slot, j], bs, jnp.float32) if bitmap
                   else ibuf[slot, j].astype(jnp.float32))
            xs = xwin[:, pl.ds(col * bs, bs)]                 # [1, bs]
            cand = ind * xs + (1.0 - ind) * _NEG_HUGE
            bm = jnp.max(cand, axis=1)                        # [bs]
            o_ref[row] = jnp.maximum(o_ref[row], bm[None, :])
        return 0

    jax.lax.fori_loop(0, nch, body, 0)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "panel_rows", "win_blocks",
                                             "n_panels", "interpret",
                                             "bitmap"))
def _bsr_nbr_max_panels(blk_ind, panel_ptr, win_start, blk_rows, blk_cols,
                        x, n_rows: int, block_size: int, panel_rows: int,
                        win_blocks: int, n_panels: int,
                        interpret: bool = False, bitmap: bool = False):
    """Panel-grid `_bsr_nbr_max` over a `bsr_panels` stream (int8 or
    bitmap-packed). x: [n_cols] f32 covering every window
    (win_start+W <= n_cols/bs guaranteed by `bsr_panels`).
    Returns [n_rows] f32 (-HUGE where no neighbors)."""
    nb = blk_ind.shape[0]
    bs = block_size
    nr = n_rows // bs
    n_cols = x.shape[0]
    assert n_cols % bs == 0 and n_cols // bs >= win_blocks, (x.shape,)
    nr_pad = n_panels * panel_rows
    ishape = (2, _CHUNK, bs // 32, bs) if bitmap else (2, _CHUNK, bs, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_panels,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # blocks stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM
        ],
        out_specs=pl.BlockSpec((panel_rows, 8, bs),
                               lambda p, *_: (p, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((1, win_blocks * bs), jnp.float32),
            pltpu.VMEM(ishape, blk_ind.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap \
        else bs * bs * blk_ind.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_nbr_max_panel_kernel, bs=bs, chunk=_CHUNK,
                          panel_rows=panel_rows, win_blocks=win_blocks,
                          bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr_pad, 8, bs), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=nb * bs * bs,
            bytes_accessed=nb * blk_bytes
            + n_panels * win_blocks * bs * 4,
            transcendentals=0),
    )(panel_ptr, win_start, blk_rows, blk_cols, blk_ind,
      x.reshape(1, n_cols))
    return out[:nr, 0, :].reshape(n_rows)


_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of ~6 MB in 16 MB VMEM


def _nbr_max_panels_fit_vmem(panel_rows: int, bs: int, win_blocks: int,
                             itemsize: int) -> bool:
    """Whether the panel neighbor-max's VMEM residents fit: double-buffered
    chunks + the x window (8-sublane padded) + the output panel. On a
    locality-ordered graph this holds at ANY N (window ~ bandwidth); an
    order-free graph degenerates to the full width and should fall back."""
    vals_bytes = 2 * _CHUNK * bs * bs * itemsize
    xwin_bytes = 8 * win_blocks * bs * 4
    out_bytes = panel_rows * 8 * bs * 4
    return vals_bytes + xwin_bytes + out_bytes <= _VMEM_BUDGET


def _nbr_max_fits_vmem(nb: int, bs: int, n_rows: int, n_cols: int,
                       itemsize: int) -> bool:
    """Whether the chunk-grid neighbor-max's VMEM residents fit: double-
    buffered [chunk, bs, bs] vals slabs + x (8-sublane padded) + output."""
    vals_bytes = 2 * _CHUNK * bs * bs * itemsize
    x_bytes = 8 * n_cols * 4
    out_bytes = (n_rows // bs) * 8 * bs * 4
    return (nb % _CHUNK == 0
            and vals_bytes + x_bytes + out_bytes <= _VMEM_BUDGET)


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
    if s.nnz:
        rows = np.repeat(np.arange(n), deg)
        pos = np.arange(s.nnz) - s.indptr[rows]
        cols[rows, pos] = s.indices
        vals[rows, pos] = s.data
    return cols, vals


@jax.jit
def ell_spmm(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray
             ) -> jnp.ndarray:
    """y[i] = sum_k vals[i,k] * x[cols[i,k]] — gather-based SpMM."""
    return jnp.einsum("nk,nkf->nf", vals, x[cols])


class SparseSupport:
    """Dispatching sparse support matrix: Pallas BSR on TPU backends
    (default; DISTGCN_DISABLE_PALLAS=1 opts out), XLA ELL gather
    otherwise."""

    def __init__(self, s: sp.spmatrix, block_size: int = 512):
        self.use_pallas = pallas_enabled()
        if self.use_pallas:
            self.bsr = BsrMatrix.from_scipy(s, block_size)
        else:
            cols, vals = ell_pack(s)
            self.cols = jnp.asarray(cols)
            self.vals = jnp.asarray(vals)
        self.n = s.shape[0]

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_pallas:
            return bsr_spmm_pallas(self.bsr, x)[: self.n]
        return ell_spmm(self.cols, self.vals, x[: self.n])

"""Fused ChebGCN layer over int8 structure blocks — the large-graph hot path.

The reference's per-layer op is ``out = act(X@W_0 + S_1@(X@W_1) + b)`` with
S_1 = L = I - normalize_adj(A) (gcn/layers.py:199-208 + gcn/utils.py:258-274).
For a 0/1 adjacency, normalize_adj is SEPARABLE: Anorm = diag(r) A diag(r)
with r = deg^-1/2 — so the SpMM needs only A's *structure*, which the
large-graph LGS already keeps on device as int8 0/1 BSR blocks
(`large.LargeGraph.ind_bsr`). This kernel exploits that to fuse the whole
layer into ONE Pallas pass:

    per nonzero block (row-grid, double-buffered HBM->VMEM DMA):
        acc += ind_block @ (r_col * x_col)          (MXU, bf16)
    per block-row, at write time:
        out_row = act( x_row @ (W0+W1)              (one MXU matmul:
                       + bias                        h@W0 + h@W1 folded)
                       - r_row * (acc @ W1) )        (right-mul commutes
                                                      across the col sum)

using  L@(h@W1) = h@W1 - r ⊙ (A @ (r ⊙ (h@W1)))  and
(r⊙h)@W1 = r⊙(h@W1) (diag scaling commutes with right matmul).

Why this wins: the f32 value-block SpMM streamed ~340 B per real edge
(VERDICT r2 weak #1) because RCM-banded conflict graphs are only ~2% dense
inside 512^2 blocks. Structure-only int8 blocks cut block traffic 4x (and
value blocks need not exist on device at all — ~3x total HBM footprint cut
at N=262k), activations stream bf16, and the inter-layer elementwise glue
(supports add, bias, leaky_relu) rides along for free instead of costing
~6 extra [N, F] HBM passes per layer.

Numerics: products are bf16 x bf16 -> f32 accumulate (MXU native). The
exact-parity path (Precision.HIGHEST f32 value blocks) stays available via
``large.large_gcn_forward(..., fused=False)``; selections were already
measured identical with bf16-stored blocks (RESULTS.md).

Only max_degree == 1 (supports [I, L] — the flagship/TWC configuration,
bash/twc_train_gcn_gdpg.sh) is fused; higher K falls back to the generic
SpMM path in `large.py`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distgcn_tpu.ops.spmm import _CHUNK   # panel_ptr is in _CHUNK units
from distgcn_tpu.ops.spmm import _unpack_bits


def _fused_layer_kernel(row_ptr_ref, blk_cols_ref, ind_hbm, x_hbm, r_hbm,
                        w1_ref, w01_ref, bias_ref, o_ref,
                        ibuf, xbuf, rbuf, hbuf, rrow, acc,
                        sem_i, sem_x, sem_r, sem_h, sem_rr,
                        *, bs, act_mode, bitmap=False):
    """One block-ROW of the fused layer per grid step (see module doc)."""
    rblk = pl.program_id(0)
    start = row_ptr_ref[rblk]
    nblk = row_ptr_ref[rblk + 1] - start

    def dma_i(slot, k):
        return pltpu.make_async_copy(ind_hbm.at[start + k], ibuf.at[slot],
                                     sem_i.at[slot])

    def dma_x(slot, k):
        c = blk_cols_ref[start + k]
        return pltpu.make_async_copy(x_hbm.at[pl.ds(c * bs, bs), :],
                                     xbuf.at[slot], sem_x.at[slot])

    def dma_r(slot, k):
        c = blk_cols_ref[start + k]
        return pltpu.make_async_copy(r_hbm.at[:, pl.ds(c * bs, bs)],
                                     rbuf.at[slot], sem_r.at[slot])

    # the row's own x block and r segment are needed only at write time —
    # start their DMA first so they overlap the whole accumulation loop
    hdma = pltpu.make_async_copy(x_hbm.at[pl.ds(rblk * bs, bs), :],
                                 hbuf, sem_h)
    rrdma = pltpu.make_async_copy(r_hbm.at[:, pl.ds(rblk * bs, bs)],
                                  rrow, sem_rr)
    hdma.start()
    rrdma.start()

    @pl.when(nblk > 0)
    def _():
        dma_i(0, 0).start()
        dma_x(0, 0).start()
        dma_r(0, 0).start()

    acc[...] = jnp.zeros_like(acc)

    def body(k, _):
        slot = jax.lax.rem(k, 2)
        nxt = jax.lax.rem(k + 1, 2)

        @pl.when(k + 1 < nblk)
        def _():
            dma_i(nxt, k + 1).start()
            dma_x(nxt, k + 1).start()
            dma_r(nxt, k + 1).start()

        dma_i(slot, k).wait()
        dma_x(slot, k).wait()
        dma_r(slot, k).wait()
        # Ind @ (r ⊙ x) == (Ind @ diag(r_col)) @ x: scale the indicator's
        # COLUMNS by the lane-layout r (r lives as [1, n] like the LGS x —
        # Mosaic rejects [n, 1] HBM slices), fold into the int8/bitmap ->
        # f32 cast (no direct i8 compare/select — Mosaic; lgs_pallas.py)
        ind = (_unpack_bits(ibuf[slot], bs, jnp.float32) if bitmap
               else ibuf[slot].astype(jnp.float32))
        inds = ind * rbuf[slot]                                # [bs, bs]
        acc[...] += jnp.dot(inds.astype(jnp.bfloat16), xbuf[slot],
                            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nblk, body, 0)

    hdma.wait()
    rrdma.wait()
    # the per-row W matmuls are negligible FLOPs — run them f32/HIGHEST so
    # the only bf16 rounding left is the activation stream + A-products
    hp = jax.lax.Precision.HIGHEST
    y = jnp.dot(hbuf[...].astype(jnp.float32), w01_ref[...],
                preferred_element_type=jnp.float32,
                precision=hp)                              # h@(W0+W1)
    lag = jnp.dot(acc[...], w1_ref[...],
                  preferred_element_type=jnp.float32,
                  precision=hp)                            # (A~ h)@W1
    # row scaling r_row ⊙ lag as diag(r_row) @ lag: r is lane-layout, so
    # build the diagonal from an iota equality mask and ride the MXU
    # (a [bs,1]-shaped sublane r would need an unsupported relayout)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1))
    dr = eye.astype(jnp.float32) * rrow[...]               # D = diag(r_row)
    rlag = jnp.dot(dr.astype(jnp.bfloat16), lag.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    out = y - rlag + bias_ref[...]
    if act_mode == 1:
        out = jnp.maximum(out, 0.2 * out)                  # leaky_relu(0.2)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "act_mode", "out_dtype",
                                             "interpret", "bitmap"))
def _fused_cheb_layer(ind_vals, row_ptr, blk_cols, x, r, w1, w01, bias,
                      n_rows: int, block_size: int, act_mode: int,
                      out_dtype=jnp.bfloat16, interpret: bool = False,
                      bitmap: bool = False):
    """One fused ChebGCN layer (K=1).

    ind_vals: [nb, bs, bs] int8 0/1 structure blocks — or, with
    ``bitmap=True``, [nb, bs//32, bs] int32 bitmap blocks
    (`ops.spmm.pack_bits_blocks` layout; 1 bit/cell, 8x less stream).
    Blocks sorted by row; every block-row non-empty —
    BsrMatrix.from_scipy guarantees both.
    x: [n_rows, F] bf16 activations. r: [1, n_rows] f32 = deg^-1/2.
    w1/w01: [F, F] f32 (W01 = W0 + W1). bias: [1, F] f32.
    Returns [n_rows, F] out_dtype.
    """
    nb = ind_vals.shape[0]
    bs = block_size
    f = x.shape[1]
    assert x.shape[0] == n_rows and r.shape == (1, n_rows), (x.shape, r.shape)
    assert f % 128 == 0, f
    nr = n_rows // bs
    ishape = (2, bs // 32, bs) if bitmap else (2, bs, bs)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nr,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # ind blocks in HBM
            pl.BlockSpec(memory_space=pl.ANY),     # x in HBM
            pl.BlockSpec(memory_space=pl.ANY),     # r in HBM
            pl.BlockSpec((f, f), lambda i, rp, bc: (0, 0)),   # w1 VMEM
            pl.BlockSpec((f, f), lambda i, rp, bc: (0, 0)),   # w01 VMEM
            pl.BlockSpec((1, f), lambda i, rp, bc: (0, 0)),   # bias VMEM
        ],
        out_specs=pl.BlockSpec((bs, f), lambda i, rp, bc: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM(ishape, ind_vals.dtype),
            pltpu.VMEM((2, bs, f), jnp.bfloat16),
            pltpu.VMEM((2, 1, bs), jnp.float32),
            pltpu.VMEM((bs, f), jnp.bfloat16),
            pltpu.VMEM((1, bs), jnp.float32),
            pltpu.VMEM((bs, f), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap else bs * bs
    return pl.pallas_call(
        functools.partial(_fused_layer_kernel, bs=bs, act_mode=act_mode,
                          bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, f), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bs * bs * f + 4 * n_rows * f * f,
            bytes_accessed=nb * (blk_bytes + 2 * bs * f)
            + 2 * n_rows * f * 4,
            transcendentals=0),
    )(row_ptr, blk_cols, ind_vals, x, r, w1, w01, bias)


def _fused_panel_kernel(panel_ptr_ref, win_start_ref, blk_rows_ref,
                        blk_cols_ref, ind_hbm, x_hbm, r_hbm,
                        w1_ref, w01_ref, bias_ref, o_ref,
                        xwin, rwin, ibuf, acc, sem_x, sem_r, sem_i,
                        *, bs, chunk, panel_rows, win_blocks, nr_b,
                        act_mode, bitmap=False):
    """Panel-grid fused layer: one slab of `panel_rows` block-rows per grid
    step. The panel's x/r windows and f32 accumulator live in VMEM for the
    whole panel; int8 indicator blocks stream in [chunk, bs, bs] slabs with
    double-buffered DMA (~8x bigger DMAs than the row-grid kernel's
    per-block fetches, and no per-block x/r traffic at all — the window is
    re-read (W/panel_rows)x instead of degree/bs x). Measured: an XLA-side
    r ⊙ x pre-scale (removing the in-loop multiply) did NOT help — at
    N=262k the loop is MXU-bound on the 2%-dense block matmuls, at 65k
    DMA/MXU-balanced — so the multiply stays fused into the cast here."""
    p = pl.program_id(0)
    c0 = panel_ptr_ref[p]
    nch = panel_ptr_ref[p + 1] - c0
    ws = win_start_ref[p]
    xd = pltpu.make_async_copy(
        x_hbm.at[pl.ds(ws * bs, win_blocks * bs), :], xwin, sem_x)
    rd = pltpu.make_async_copy(
        r_hbm.at[:, pl.ds(ws * bs, win_blocks * bs)], rwin, sem_r)
    xd.start()
    rd.start()

    def dma(slot, c):
        return pltpu.make_async_copy(
            ind_hbm.at[pl.ds((c0 + c) * chunk, chunk)], ibuf.at[slot],
            sem_i.at[slot])

    dma(0, 0).start()            # every panel has >= 1 chunk (bsr_panels)
    acc[...] = jnp.zeros_like(acc)
    xd.wait()
    rd.wait()

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(nxt, c + 1).start()

        dma(slot, c).wait()
        for j in range(chunk):
            b = (c0 + c) * chunk + j
            lrow = blk_rows_ref[b] - p * panel_rows
            lcol = blk_cols_ref[b] - ws
            # Ind @ diag(r_col): fold the col scaling into the cast
            ind = (_unpack_bits(ibuf[slot, j], bs, jnp.float32) if bitmap
                   else ibuf[slot, j].astype(jnp.float32))
            inds = ind * rwin[:, pl.ds(lcol * bs, bs)]        # [bs, bs]
            prod = jnp.dot(inds.astype(jnp.bfloat16),
                           xwin[pl.ds(lcol * bs, bs), :],
                           preferred_element_type=jnp.float32)
            acc[pl.ds(lrow * bs, bs), :] += prod
        return 0

    jax.lax.fori_loop(0, nch, body, 0)

    # epilogue: the panel's own row slab comes straight from the window
    # (bsr_panels guarantees coverage); per-row W matmuls f32/HIGHEST
    hp = jax.lax.Precision.HIGHEST
    eye = (jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1))
    eyef = eye.astype(jnp.float32)
    off = p * panel_rows - ws            # >= 0 (window covers panel rows)
    for i in range(panel_rows):
        @pl.when(p * panel_rows + i < nr_b)   # last panel may be partial
        def _():
            lo = (off + i) * bs
            hrow = xwin[pl.ds(lo, bs), :].astype(jnp.float32)
            y = jnp.dot(hrow, w01_ref[...],
                        preferred_element_type=jnp.float32, precision=hp)
            lag = jnp.dot(acc[pl.ds(i * bs, bs), :], w1_ref[...],
                          preferred_element_type=jnp.float32, precision=hp)
            # row scaling r ⊙ lag as diag(r) @ lag (r is lane-layout; a
            # [bs, 1] sublane r would need an unsupported relayout)
            dr = eyef * rwin[:, pl.ds(lo, bs)]
            rlag = jnp.dot(dr.astype(jnp.bfloat16),
                           lag.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            out = y - rlag + bias_ref[...]
            if act_mode == 1:
                out = jnp.maximum(out, 0.2 * out)
            o_ref[pl.ds(i * bs, bs), :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_rows", "block_size",
                                             "panel_rows", "win_blocks",
                                             "n_panels", "act_mode",
                                             "out_dtype", "interpret",
                                             "bitmap"))
def _fused_cheb_layer_panels(ind_vals, panel_ptr, win_start, blk_rows,
                             blk_cols, x, r, w1, w01, bias, n_rows: int,
                             block_size: int, panel_rows: int,
                             win_blocks: int, n_panels: int, act_mode: int,
                             out_dtype=jnp.bfloat16, interpret: bool = False,
                             bitmap: bool = False):
    """One fused ChebGCN layer (K=1) over a `ops.spmm.bsr_panels` stream
    (int8 or bitmap-packed). Same contract as `_fused_cheb_layer`;
    preferred when the panel windows fit VMEM (`panels_fit_vmem`)."""
    nb = ind_vals.shape[0]
    bs = block_size
    f = x.shape[1]
    assert x.shape[0] == n_rows and r.shape == (1, n_rows), (x.shape, r.shape)
    assert f % 128 == 0, f
    nr_b = n_rows // bs
    nr_pad = n_panels * panel_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_panels,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),     # ind blocks in HBM
            pl.BlockSpec(memory_space=pl.ANY),     # x in HBM
            pl.BlockSpec(memory_space=pl.ANY),     # r in HBM
            pl.BlockSpec((f, f), lambda p, *_: (0, 0)),   # w1 VMEM
            pl.BlockSpec((f, f), lambda p, *_: (0, 0)),   # w01 VMEM
            pl.BlockSpec((1, f), lambda p, *_: (0, 0)),   # bias VMEM
        ],
        out_specs=pl.BlockSpec((panel_rows * bs, f), lambda p, *_: (p, 0)),
        scratch_shapes=[
            pltpu.VMEM((win_blocks * bs, f), jnp.bfloat16),   # x window
            pltpu.VMEM((1, win_blocks * bs), jnp.float32),    # r window
            pltpu.VMEM((2, _CHUNK, bs // 32, bs) if bitmap
                       else (2, _CHUNK, bs, bs), ind_vals.dtype),
            pltpu.VMEM((panel_rows * bs, f), jnp.float32),    # acc
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    blk_bytes = (bs * bs // 8) if bitmap else bs * bs
    out = pl.pallas_call(
        functools.partial(_fused_panel_kernel, bs=bs, chunk=_CHUNK,
                          panel_rows=panel_rows, win_blocks=win_blocks,
                          nr_b=nr_b, act_mode=act_mode, bitmap=bitmap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr_pad * bs, f), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bs * bs * f + 4 * n_rows * f * f,
            bytes_accessed=nb * blk_bytes
            + n_panels * win_blocks * bs * (2 * f + 4) + 2 * n_rows * f,
            transcendentals=0),
    )(panel_ptr, win_start, blk_rows, blk_cols, ind_vals, x, r, w1, w01,
      bias)
    return out[:n_rows]


def _fused_gwin_kernel(panel_ptr_ref, wlist_ref, gofs_ref, own_ofs_ref,
                       blk_rows_ref, ind_hbm, x_hbm, r_hbm, w1_ref,
                       w01_ref, bias_ref, o_ref, xwin, rwin, ibuf, acc,
                       sem_x, sem_r, sem_i,
                       *, bs, chunk, panel_rows, wg, nr_b, act_mode):
    """Gather-window fused layer: like `_fused_panel_kernel` but the x/r
    window holds only the panel's DISTINCT block-columns (wlist), fetched
    as Wg per-block DMAs pipelined 8 deep instead of one contiguous span.
    Cuts the per-layer x stream where the span is sparse (serpentine
    262k: Wg=52 vs W=81) and measured FASTER even at Wg == W (the
    pipelined slices overlap the prologue better than one monolithic
    copy). Blocks address the window through gofs (block -> window slot);
    the epilogue reads the panel's own rows at own_ofs (the own row range
    is contiguous in the sorted column list). Bitmap streams only."""
    p = pl.program_id(0)
    c0 = panel_ptr_ref[p]
    nch = panel_ptr_ref[p + 1] - c0

    def xdma(w):
        c = wlist_ref[p, w]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(c * bs, bs), :],
            xwin.at[pl.ds(w * bs, bs), :], sem_x.at[w % 8])

    def rdma(w):
        c = wlist_ref[p, w]
        return pltpu.make_async_copy(
            r_hbm.at[:, pl.ds(c * bs, bs)],
            rwin.at[:, pl.ds(w * bs, bs)], sem_r.at[w % 8])

    def gstart(w, _):
        xdma(w).start()
        rdma(w).start()
        return 0

    jax.lax.fori_loop(0, jnp.minimum(8, wg), gstart, 0)

    def dma(slot, c):
        return pltpu.make_async_copy(
            ind_hbm.at[pl.ds((c0 + c) * chunk, chunk)], ibuf.at[slot],
            sem_i.at[slot])

    dma(0, 0).start()
    acc[...] = jnp.zeros_like(acc)

    def gpipe(w, _):
        xdma(w).wait()
        rdma(w).wait()

        @pl.when(w + 8 < wg)
        def _():
            xdma(w + 8).start()
            rdma(w + 8).start()
        return 0

    jax.lax.fori_loop(0, wg, gpipe, 0)

    def body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(nxt, c + 1).start()

        dma(slot, c).wait()
        for j in range(chunk):
            b = (c0 + c) * chunk + j
            lrow = blk_rows_ref[b] - p * panel_rows
            lw = gofs_ref[b]
            ind = _unpack_bits(ibuf[slot, j], bs, jnp.float32)
            inds = ind * rwin[:, pl.ds(lw * bs, bs)]
            prod = jnp.dot(inds.astype(jnp.bfloat16),
                           xwin[pl.ds(lw * bs, bs), :],
                           preferred_element_type=jnp.float32)
            acc[pl.ds(lrow * bs, bs), :] += prod
        return 0

    jax.lax.fori_loop(0, nch, body, 0)

    hp = jax.lax.Precision.HIGHEST
    eye = (jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1))
    eyef = eye.astype(jnp.float32)
    oofs = own_ofs_ref[p]
    for i in range(panel_rows):
        @pl.when(p * panel_rows + i < nr_b)
        def _(i=i):
            lo = (oofs + i) * bs
            hrow = xwin[pl.ds(lo, bs), :].astype(jnp.float32)
            y = jnp.dot(hrow, w01_ref[...],
                        preferred_element_type=jnp.float32, precision=hp)
            lag = jnp.dot(acc[pl.ds(i * bs, bs), :], w1_ref[...],
                          preferred_element_type=jnp.float32, precision=hp)
            dr = eyef * rwin[:, pl.ds(lo, bs)]
            rlag = jnp.dot(dr.astype(jnp.bfloat16),
                           lag.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            out = y - rlag + bias_ref[...]
            if act_mode == 1:
                out = jnp.maximum(out, 0.2 * out)
            o_ref[pl.ds(i * bs, bs), :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "n_rows", "block_size", "panel_rows", "wg", "n_panels", "act_mode",
    "out_dtype", "interpret"))
def _fused_cheb_layer_gwin(ind_vals, panel_ptr, wlist, gofs, own_ofs,
                           blk_rows, x, r, w1, w01, bias, n_rows: int,
                           block_size: int, panel_rows: int, wg: int,
                           n_panels: int, act_mode: int,
                           out_dtype=jnp.bfloat16, interpret: bool = False):
    """One fused ChebGCN layer (K=1) over a gather-window panel stream
    (`ops.spmm.panel_gather_meta`). Bitmap ind_vals only."""
    nb = ind_vals.shape[0]
    bs = block_size
    f = x.shape[1]
    assert f % 128 == 0, f
    nr_b = n_rows // bs
    nr_pad = n_panels * panel_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_panels,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((f, f), lambda p, *_: (0, 0)),
            pl.BlockSpec((f, f), lambda p, *_: (0, 0)),
            pl.BlockSpec((1, f), lambda p, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((panel_rows * bs, f), lambda p, *_: (p, 0)),
        scratch_shapes=[
            pltpu.VMEM((wg * bs, f), jnp.bfloat16),
            pltpu.VMEM((1, wg * bs), jnp.float32),
            pltpu.VMEM((2, _CHUNK, bs // 32, bs), ind_vals.dtype),
            pltpu.VMEM((panel_rows * bs, f), jnp.float32),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_fused_gwin_kernel, bs=bs, chunk=_CHUNK,
                          panel_rows=panel_rows, wg=wg, nr_b=nr_b,
                          act_mode=act_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr_pad * bs, f), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * bs * bs * f + 4 * n_rows * f * f,
            bytes_accessed=nb * bs * bs // 8
            + n_panels * wg * bs * (2 * f + 4) + 2 * n_rows * f,
            transcendentals=0),
    )(panel_ptr, wlist, gofs, own_ofs, blk_rows, ind_vals, x, r, w1, w01,
      bias)
    return out[:n_rows]


def gwin_fit_vmem(panel_rows: int, bs: int, wg: int, f: int) -> bool:
    """VMEM residents of `_fused_cheb_layer_gwin` (bitmap chunks): gather
    x window (bf16) + 8-sublane-padded r window + chunk double-buffer +
    f32 accumulator + double-buffered output panel at the WORST-CASE
    f32 out_dtype (the final layer emits f32 — pr=32/Wg=96 at N=262k
    compiled for bf16 layers but hit scoped-vmem OOM at 18.2 MB on the
    f32 head, so the head's footprint is the binding one)."""
    return (wg * bs * f * 2 + 8 * wg * bs * 4 + 2 * _CHUNK * bs * bs // 8
            + panel_rows * bs * f * 4
            + 2 * panel_rows * bs * f * 4) <= 15 * 1024 * 1024


def panels_fit_vmem(panel_rows: int, bs: int, win_blocks: int,
                    f: int, bitmap: bool = False) -> bool:
    """VMEM residents of `_fused_cheb_layer_panels`: x window (bf16) + r
    window + block chunk double-buffer (int8, or 8x smaller bitmap) + f32
    accumulator + double-buffered output panel."""
    blk = (bs * bs // 8) if bitmap else bs * bs
    return (win_blocks * bs * f * 2 + 8 * win_blocks * bs * 4
            + 2 * _CHUNK * blk + panel_rows * bs * f * (4 + 2 * 2)
            ) <= 12 * 1024 * 1024


def pad_layer_params(layer: dict, f: int) -> dict:
    """Pad a ChebGCN layer's params to the kernel's [F, F] lane width.

    layer: {'w_0': [Fin, Fout], 'w_1': [Fin, Fout], optional 'bias'} (the
    compat/tf1_ckpt layout). Returns {'w1', 'w01' [F, F] bf16,
    'bias' [1, F] f32}. Zero-padding is exact: padded input lanes are zero,
    padded output lanes produce zeros that the next layer's zero input
    rows ignore.
    """
    w0, w1 = layer["w_0"], layer["w_1"]
    fi, fo = w0.shape
    assert fi <= f and fo <= f, (w0.shape, f)
    pad = ((0, f - fi), (0, f - fo))
    w0p = jnp.pad(w0, pad).astype(jnp.float32)
    w1p = jnp.pad(w1, pad).astype(jnp.float32)
    bias = layer.get("bias")
    bp = (jnp.pad(bias.reshape(1, -1), ((0, 0), (0, f - fo)))
          .astype(jnp.float32) if bias is not None
          else jnp.zeros((1, f), jnp.float32))
    return {"w1": w1p, "w01": w0p + w1p, "bias": bp}


def fused_forward(ind_vals, row_ptr, blk_cols, r, params_list, feats,
                  n_rows: int, block_size: int, f: int = 128,
                  final_act_mode: int = 0, interpret: bool = False,
                  blk_rows=None, panel_ptr=None, win_start=None,
                  panel_rows: int = 0, win_blocks: int = 0,
                  n_panels: int = 0, bitmap: bool = False,
                  gather=None) -> jnp.ndarray:
    """L-layer fused ChebGCN forward (K=1): leaky_relu(0.2) hidden layers,
    final layer act per ``final_act_mode`` (0=identity — GCN_DQN,
    gcn/models.py:487-575; 1=leaky_relu — GCN2_DQN final_act_same). feats:
    [n_rows, F0] f32; returns [n_rows, out_dim] f32.

    When the `ops.spmm.bsr_panels` metadata is passed (blk_rows +
    panel_ptr/win_start/...) and the panel windows fit VMEM, layers run on
    the panel-grid kernel (bigger DMAs, no per-block x/r traffic);
    otherwise the row-grid kernel.
    """
    # gather-window kernel when metadata present and its window fits:
    # strictly less (or equal) x stream than the contiguous span, and
    # measured faster even at Wg == W (pipelined slice DMAs)
    use_gwin = (gather is not None and bitmap
                and gwin_fit_vmem(panel_rows, block_size, gather[3], f))
    use_panels = (not use_gwin and panel_ptr is not None
                  and panels_fit_vmem(panel_rows, block_size, win_blocks, f,
                                      bitmap=bitmap))
    h = jnp.pad(feats, ((0, 0), (0, f - feats.shape[1]))).astype(jnp.bfloat16)
    r = r.reshape(1, -1)    # kernel wants the lane layout
    nl = len(params_list)
    for li, layer in enumerate(params_list):
        p = pad_layer_params(layer, f)
        last = li == nl - 1
        act_mode = final_act_mode if last else 1
        out_dtype = jnp.float32 if last else jnp.bfloat16
        if use_gwin:
            wlist, gofs, own_ofs, wg = gather
            h = _fused_cheb_layer_gwin(
                ind_vals, panel_ptr, wlist, gofs, own_ofs, blk_rows, h, r,
                p["w1"], p["w01"], p["bias"], n_rows, block_size,
                panel_rows, wg, n_panels, act_mode=act_mode,
                out_dtype=out_dtype, interpret=interpret)
        elif use_panels:
            h = _fused_cheb_layer_panels(
                ind_vals, panel_ptr, win_start, blk_rows, blk_cols, h, r,
                p["w1"], p["w01"], p["bias"], n_rows, block_size,
                panel_rows, win_blocks, n_panels, act_mode=act_mode,
                out_dtype=out_dtype, interpret=interpret, bitmap=bitmap)
        else:
            h = _fused_cheb_layer(
                ind_vals, row_ptr, blk_cols, h, r, p["w1"], p["w01"],
                p["bias"], n_rows, block_size, act_mode=act_mode,
                out_dtype=out_dtype, interpret=interpret, bitmap=bitmap)
    return h[:, :params_list[-1]["w_0"].shape[1]]

"""Large-graph end-to-end pipeline: Pallas kernels inside the GCN forward.

The reference's hot op is ``support @ (X @ W)`` (gcn/layers.py:199-208) on
graphs of N <= ~300 nodes; the dense batched path (models/layers.py) covers
that regime. This module is the **large-N** model path (N ~ 1e4..1e6, e.g. a
city-scale conflict graph). On TPU, 0/1 adjacencies run whole GCN layers
through the fused int8-structure Pallas kernel (`ops/cheb_fused.py` —
normalize_adj is separable, so structure + two diagonal scalings replace
value blocks entirely); K>1 supports and weighted adjacencies fall back to
the BSR SpMM kernels (`ops.spmm`). The LGS solve streams the same int8
structure blocks through the Pallas chunk-grid/panel-grid neighbor-max
(`bsr_lgs`; `ops.lgs.ell_lgs` is the non-TPU fallback). End-to-end:

    weights -> features -> L-layer ChebGCN (BSR SpMM) -> gcn weights
            -> ELL LGS -> schedule + utility

in ONE jitted program per graph structure, mirroring `pipeline.py`'s small-
graph closed loop.

Support semantics match the reference exactly: supports are
[I, L, L^2, ..., L^K] with L = I - normalize_adj(A) (gcn/utils.py:258-274),
but L^k is never materialized (it densifies) — ``L^k @ y`` is computed by k
applications of ``y - Anorm @ y``, so only Anorm (the sparsity of A itself)
is stored.

Feature semantics match `mwis_gdpg_call.py:82-97` (makestate): predict='mwis'
-> row-normalized ones (1/F); else w/max(w) broadcast.

On non-TPU backends the same pipeline runs with the XLA ELL gather SpMM
(`ops.spmm.ell_spmm`) — numerically identical path used by the parity tests.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from distgcn_tpu.core import prep
from distgcn_tpu.models.layers import leaky_relu02, identity
from distgcn_tpu.ops.lgs import ell_lgs
from distgcn_tpu.ops import spmm as spmm_mod
from distgcn_tpu.ops.spmm import (BsrMatrix, bsr_row_ptr, ell_pack,
                                  pallas_enabled)


@dataclass
class LargeGraph:
    """A single large conflict graph, preprocessed for the device pipeline.

    Anorm = normalize_adj(A) is held twice: BSR blocks for the Pallas SpMM
    (TPU) and ELLPACK cols/vals for the gather SpMM fallback + the LGS
    neighbor lists (the two share the sparsity pattern of A).
    """
    n: int                      # real node count
    n_pad: int                  # padded (multiple of block_size)
    nnz: int                    # directed edge count of A
    block_size: int
    mask: jnp.ndarray           # [n_pad] bool
    ell_cols: jnp.ndarray       # [n_pad, K] int32
    ell_vals: jnp.ndarray       # [n_pad, K] f32 (Anorm values; 0 = padding)
    ell_valid: jnp.ndarray      # [n_pad, K] bool (real-edge mask)
    # f32/bf16 Anorm VALUE blocks — built only when the normalization is
    # not separable (weighted adjacency) or forced via value_blocks=True;
    # for 0/1 adjacencies the int8 structure blocks + `r` cover every op
    bsr: Optional[BsrMatrix] = None      # TPU only
    row_ptr: Optional[jnp.ndarray] = None
    # int8 0/1 structure-only BSR: the LGS neighbor-max operand AND (for
    # separable graphs) the SpMM/fused-layer operand. Block size
    # independently tunable (see build_large_graph for the measured pick)
    ind_bsr: Optional[BsrMatrix] = None
    ind_row_ptr: Optional[jnp.ndarray] = None
    # panel metadata for the ind stream (ops.spmm.BsrPanels; ind_bsr IS
    # panels.bsr) — lets the LGS neighbor-max run panel-resident at any N
    panels: Optional["spmm_mod.BsrPanels"] = None
    # structure stream stored bitmap-packed (1 bit/cell, ops.spmm
    # pack_bits_blocks layout) — 8x less HBM stream + footprint than int8;
    # at ~2% in-band density this is the difference between ~54 and ~7
    # block bytes per edge (VERDICT r3 weak #6)
    bitmap: bool = False
    # Anorm = diag(r) A diag(r) with r = deg^-1/2, exact for 0/1
    # adjacencies (normalize_adj is separable there) — lets every SpMM
    # stream structure instead of values (ops/cheb_fused.py)
    r: Optional[jnp.ndarray] = None      # [n_pad, 1] f32
    separable: bool = False
    interpret: bool = False              # Pallas interpret mode (tests)
    # gather-window metadata (wlist, gofs, own_ofs, Wg) for the fused
    # gwin kernel (ops.spmm.panel_gather_meta) — bitmap streams only
    gather: Optional[tuple] = None

    @property
    def use_pallas(self) -> bool:
        return self.ind_bsr is not None


def build_large_graph(adj, block_size: int = 512,
                      use_pallas: Optional[bool] = None,
                      interpret: bool = False,
                      block_dtype=np.float32,
                      ind_block_size: Optional[int] = None,
                      value_blocks: Optional[bool] = None,
                      bit_pack: Optional[bool] = None,
                      tune_f: int = 128) -> LargeGraph:
    """Preprocess a scipy adjacency into a `LargeGraph`.

    Keep the graph locality-ordered (geometric/RCM) before calling — BSR
    density, and with it kernel throughput, depends on it (ops/spmm.py
    module notes).

    For 0/1 adjacencies (every conflict graph) normalize_adj is separable
    (Anorm = diag(r) A diag(r)), so by default only int8 STRUCTURE blocks
    go to the device — the SpMM and the LGS share them — cutting block
    traffic 4x and HBM footprint ~3x vs f32 value blocks. Pass
    ``value_blocks=True`` to also build value blocks (the
    Precision.HIGHEST parity path); weighted adjacencies always build them.
    """
    adj = sp.csr_matrix(adj)
    n = adj.shape[0]
    anorm = sp.csr_matrix(prep.normalize_adj(adj))
    separable = bool(adj.nnz == 0 or np.all(adj.data == 1))
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if value_blocks is None:
        value_blocks = not separable
    n_pad = -(-n // block_size) * block_size
    cols, vals = ell_pack(anorm)
    k = cols.shape[1]
    cols_p = np.tile(np.arange(n_pad, dtype=np.int32)[:, None], (1, k))
    vals_p = np.zeros((n_pad, k), np.float32)
    cols_p[:n] = cols
    vals_p[:n] = vals
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    g = LargeGraph(
        n=n, n_pad=n_pad, nnz=int(adj.nnz), block_size=block_size,
        mask=jnp.asarray(mask), ell_cols=jnp.asarray(cols_p),
        ell_vals=jnp.asarray(vals_p), ell_valid=jnp.asarray(vals_p != 0),
        separable=separable, interpret=interpret)
    if separable:
        # d_inv_sqrt exactly as normalize_adj computes it (float64 power)
        rowsum = np.asarray(adj.sum(1)).ravel()
        with np.errstate(divide="ignore"):
            r = np.power(rowsum, -0.5)
        r[np.isinf(r)] = 0.0
        rp = np.zeros((n_pad, 1), np.float32)
        rp[:n, 0] = r
        g.r = jnp.asarray(rp)
    if use_pallas:
        if value_blocks:
            # block_dtype=bfloat16 halves upload + HBM block traffic at
            # ~1e-2 relative error on the GCN scores
            g.bsr = BsrMatrix.from_scipy(anorm, block_size,
                                         dtype=block_dtype)
            g.row_ptr = bsr_row_ptr(g.bsr)
        # measured end-to-end (fused forward + LGS, N=65k/262k): 256 beats
        # 512 (3.28/2.80 vs 3.23/2.66 Gedge/s) — the fused forward's MXU +
        # DMA waste shrinks with block area faster than per-block loop
        # overhead grows; 128 halves the savings and 4x's the overhead
        ibs = ind_block_size or min(block_size, 256)
        if n_pad % ibs:
            raise ValueError(
                f"ind_block_size={ibs} must divide n_pad={n_pad} or the "
                "LGS kernel would read past the weight vector")
        ind = anorm.copy()
        ind.data[:] = 1.0    # structure only; n_pad stays the SpMM's
        ind.resize(n_pad, n_pad)
        auto_pack = bit_pack is None
        if auto_pack:
            bit_pack = ibs % 32 == 0
        g.bitmap = bool(bit_pack)
        # panel-height auto-tune: the fused-layer x window is re-read
        # n_panels times per layer, so taller panels cut HBM stream
        # (x-traffic / layer = n_panels * W * bs * F * 2B) — pick the
        # tallest height whose window still fits the fused (f=128) and
        # LGS kernels' VMEM residents (measured: 4 -> 16 block-rows is
        # +19% at N=262k, +5% at 65k). Bitmap streams prefer the
        # gather-window fused kernel (distinct cols only, Wg <= W:
        # bit-exact and measured faster at every probed config) — then
        # only the LGS side constrains the contiguous span.
        from distgcn_tpu.ops.cheb_fused import gwin_fit_vmem, panels_fit_vmem
        item = 0.125 if g.bitmap else 1
        # LGS chunk-kernel fit is pr-independent (whole stream + x + out)
        n_blocks_est = spmm_mod._count_touched_blocks(ind, ibs)
        lgs_chunks_ok = spmm_mod._nbr_max_fits_vmem(
            -(-n_blocks_est // spmm_mod._CHUNK) * spmm_mod._CHUNK,
            ibs, n_pad, n_pad, item)
        # `tune_f` is the feature lane-width the fit checks assume (the
        # flagship models run f=128); fused_forward re-checks fit at the
        # ACTUAL model width and falls back to the row-grid kernel, so a
        # wider model is safe but should pass its width here to keep the
        # tall-panel speedups
        pr_sel, use_gather = 4, False
        gw_cache = {}
        for pr in (32, 16, 8):
            w_pr = spmm_mod.panel_window_width(ind, ibs, pr)
            lgs_ok = lgs_chunks_ok or spmm_mod._nbr_max_panels_fit_vmem(
                pr, ibs, w_pr, item)
            if not lgs_ok:
                continue
            if g.bitmap:
                wg_pr = gw_cache[pr] = spmm_mod.panel_gather_width(
                    ind, ibs, pr)
                if gwin_fit_vmem(pr, ibs, wg_pr, tune_f):
                    pr_sel, use_gather = pr, True
                    break
            if panels_fit_vmem(pr, ibs, w_pr, tune_f, bitmap=g.bitmap):
                pr_sel = pr
                break
        g.panels = spmm_mod.bsr_panels(
            ind, ibs, panel_rows=pr_sel,
            dtype="bits" if g.bitmap else np.int8)
        g.ind_bsr = g.panels.bsr
        if g.bitmap and not use_gather:
            wg_sel = gw_cache.get(pr_sel)
            if wg_sel is None:
                wg_sel = spmm_mod.panel_gather_width(ind, ibs, pr_sel)
            use_gather = gwin_fit_vmem(pr_sel, ibs, wg_sel, tune_f)
        if g.bitmap and use_gather:
            g.gather = spmm_mod.panel_gather_meta(g.panels, n_pad // ibs)
        if g.bitmap and auto_pack:
            # bitmap streams only run on the chunk-/panel-grid kernels; on
            # order-free graphs whose panels degenerate (huge win_blocks)
            # neither fits VMEM and solve would raise — fall back to int8 +
            # block-grid instead of failing later
            fits = (spmm_mod._nbr_max_fits_vmem(
                        g.ind_bsr.num_blocks, ibs, n_pad, n_pad, 0.125)
                    or spmm_mod._nbr_max_panels_fit_vmem(
                        g.panels.panel_rows, ibs, g.panels.win_blocks,
                        0.125))
            if not fits:
                import warnings
                warnings.warn(
                    "bitmap panels do not fit the chunk- or panel-grid "
                    "kernels (order-free graph?) — falling back to int8 "
                    "structure blocks; locality-order the graph (RCM) to "
                    "restore the bitmap path")
                g.bitmap = False
                g.gather = None
                g.panels = spmm_mod.bsr_panels(ind, ibs, dtype=np.int8)
                g.ind_bsr = g.panels.bsr
        g.ind_row_ptr = bsr_row_ptr(g.ind_bsr)
    return g


def graph_arrays(graph: LargeGraph) -> dict:
    """The graph's device arrays as a pytree — passed to jitted programs as
    ARGUMENTS. Never close a jit over these: closure arrays become jaxpr
    constants, and for a city-scale BSR (GBs of blocks) the constant-laden
    program breaks compile paths (observed: the axon remote-compile tunnel
    rejects the request with HTTP 413)."""
    d = {"mask": graph.mask, "ell_cols": graph.ell_cols,
         "ell_vals": graph.ell_vals, "ell_valid": graph.ell_valid}
    if graph.use_pallas:
        d.update(ind_vals=graph.ind_bsr.blk_vals,
                 ind_rows=graph.ind_bsr.blk_rows,
                 ind_cols=graph.ind_bsr.blk_cols,
                 ind_row_ptr=graph.ind_row_ptr,
                 panel_ptr=graph.panels.panel_ptr,
                 win_start=graph.panels.win_start)
        if graph.gather is not None:
            d.update(g_wlist=graph.gather[0], g_gofs=graph.gather[1],
                     g_own_ofs=graph.gather[2])
        if graph.bsr is not None:
            d.update(blk_vals=graph.bsr.blk_vals, row_ptr=graph.row_ptr,
                     blk_cols=graph.bsr.blk_cols,
                     blk_rows=graph.bsr.blk_rows)
    if graph.r is not None:
        d["r"] = graph.r
    return d


def _make_spmm(graph: LargeGraph, arrs: dict
               ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """y -> Anorm @ y on [n_pad, F]; static config from `graph`, array data
    from `arrs` (traced arguments)."""
    if graph.use_pallas and "blk_vals" not in arrs:
        # separable: Anorm@y = r ⊙ (A @ (r ⊙ y)) through the int8
        # structure blocks — values stay exact f32, block traffic 1/4
        n_rows = graph.ind_bsr.n_rows
        ibs, interp = graph.ind_bsr.block_size, graph.interpret

        bmp = graph.bitmap

        def anorm_spmm(y):
            f = y.shape[1]
            fp = -(-f // 128) * 128
            if fp != f:
                y = jnp.pad(y, ((0, 0), (0, fp - f)))
            out = spmm_mod._bsr_spmm_rows(
                arrs["ind_vals"], arrs["ind_row_ptr"], arrs["ind_cols"],
                y * arrs["r"], n_rows, ibs, interpret=interp, bitmap=bmp)
            out = out * arrs["r"]
            return out[:, :f] if fp != f else out

        return anorm_spmm

    if graph.use_pallas:
        n_rows, bs, interp = graph.bsr.n_rows, graph.block_size, graph.interpret

        def anorm_spmm(y):
            # Mosaic requires the feature (lane) dim aligned to 128; the
            # head layer's F=out_dim (often 1) must be padded for the kernel
            f = y.shape[1]
            fp = -(-f // 128) * 128
            if fp != f:
                y = jnp.pad(y, ((0, 0), (0, fp - f)))
            out = spmm_mod._bsr_spmm_rows(
                arrs["blk_vals"], arrs["row_ptr"], arrs["blk_cols"], y,
                n_rows, bs, interpret=interp)
            return out[:, :f] if fp != f else out

        return anorm_spmm

    def anorm_spmm(y):
        return spmm_mod.ell_spmm(arrs["ell_cols"], arrs["ell_vals"], y)

    return anorm_spmm


def large_gcn_forward(graph: LargeGraph, params_list, x,
                      hidden_act=leaky_relu02, final_act=identity,
                      max_degree: int = 1, arrs: Optional[dict] = None,
                      fused: Optional[bool] = None) -> jnp.ndarray:
    """L-layer ChebGCN forward on a large graph (gcn/layers.py:199-208 per
    layer, gcn/models.py:487-575 stacking), every support application through
    the sparse SpMM.

    params_list: [{'w_0': [Fin,Fout], 'w_1': ..., optional 'bias'}] per layer
    (the compat/tf1_ckpt layout, also produced by `params_to_list`).
    x: [n_pad, F] features. Pass `arrs` when calling under jit (see
    `graph_arrays`).

    On TPU, separable graphs with K=1 supports take the fused whole-layer
    kernel (`ops/cheb_fused.py`: int8 structure blocks + bf16 activation
    stream — ~4x the value-block SpMM path, bf16-class numerics). Pass
    ``fused=False`` (or set DISTGCN_LARGE_EXACT=1) for the f32
    Precision.HIGHEST parity path.
    """
    if arrs is None:
        arrs = graph_arrays(graph)
    if fused is None:
        fused = (graph.use_pallas and graph.separable and max_degree == 1
                 and hidden_act is leaky_relu02
                 and (final_act is identity or final_act is leaky_relu02)
                 and os.environ.get("DISTGCN_LARGE_EXACT", "0") != "1")
    if fused:
        from distgcn_tpu.ops import cheb_fused
        dims = [d for p in params_list for d in p["w_0"].shape]
        f = -(-max(dims) // 128) * 128
        ind = graph.ind_bsr
        pans = graph.panels
        gather = None
        if graph.gather is not None and "g_wlist" in arrs:
            gather = (arrs["g_wlist"], arrs["g_gofs"], arrs["g_own_ofs"],
                      graph.gather[3])
        return cheb_fused.fused_forward(
            arrs["ind_vals"], arrs["ind_row_ptr"], arrs["ind_cols"],
            arrs["r"], params_list, x, ind.n_rows, ind.block_size, f=f,
            final_act_mode=1 if final_act is leaky_relu02 else 0,
            interpret=graph.interpret,
            blk_rows=arrs["ind_rows"], panel_ptr=arrs["panel_ptr"],
            win_start=arrs["win_start"], panel_rows=pans.panel_rows,
            win_blocks=pans.win_blocks, n_panels=pans.n_panels,
            bitmap=graph.bitmap, gather=gather)
    anorm_spmm = _make_spmm(graph, arrs)
    hp = jax.lax.Precision.HIGHEST
    h = x
    nl = len(params_list)
    for li, layer in enumerate(params_list):
        out = jnp.matmul(h, layer["w_0"], precision=hp)     # S0 = I
        for k in range(1, max_degree + 1):
            y = jnp.matmul(h, layer[f"w_{k}"], precision=hp)
            for _ in range(k):                               # L^k @ y
                y = y - anorm_spmm(y)
            out = out + y
        if "bias" in layer:
            out = out + layer["bias"]
        h = hidden_act(out) if li < nl - 1 else final_act(out)
    return h


def bsr_lgs(graph: LargeGraph, arrs: dict, wts: jnp.ndarray,
            mask: jnp.ndarray, max_rounds: Optional[int] = None):
    """LGS over a large graph with Pallas BSR neighbor reductions.

    Same rank-based rounds as `ops.lgs` (heuristics.py:77-116 with the
    :106-111 tie-break pre-folded into ranks), but each round's two
    neighbor reductions (remaining-rank max, winner spread) stream the
    graph's BSR blocks (`ops.spmm._bsr_nbr_max`) instead of XLA gathers —
    the gather-based `ell_lgs` runs ~100x slower on TPU at this scale.
    Ranks are exact in f32 (n < 2^24). Returns (sel, util, rounds).
    """
    from distgcn_tpu.ops.lgs import lgs_ranks

    interp = graph.interpret
    ind = graph.ind_bsr
    n_rows, ibs = ind.n_rows, ind.block_size
    n = wts.shape[0]
    if n_rows >= 1 << 24:
        # ranks ride the f32 neighbor-max; integers above 2^24 are not
        # exact in f32, so tied ranks would stall rounds (same guard as
        # parallel/large_sharded.make_sharded_large_solve)
        raise ValueError(f"n_pad={n_rows} >= 2^24: LGS ranks lose "
                         "exactness in f32 — partition the solve")
    ranks = lgs_ranks(wts).astype(jnp.float32)
    sel0 = jnp.where(mask, jnp.int8(-1), jnp.int8(0))
    cap = n if max_rounds is None else int(max_rounds)
    bmp = graph.bitmap
    # bitmap blocks are 8x denser than int8 — reflect that in the VMEM fit
    itemsize = 0.125 if bmp else arrs["ind_vals"].dtype.itemsize
    use_chunks = spmm_mod._nbr_max_fits_vmem(
        ind.num_blocks, ibs, n_rows, n_rows, itemsize)
    pans = graph.panels
    use_panels = (not use_chunks and pans is not None
                  and spmm_mod._nbr_max_panels_fit_vmem(
                      pans.panel_rows, ibs, pans.win_blocks, itemsize))
    if bmp and not (use_chunks or use_panels):
        # the block-grid fallback has no bitmap path; on RCM-ordered
        # graphs panels always fit, so this only triggers on order-free
        # inputs the BSR formats degenerate on anyway
        raise ValueError("bitmap structure stream needs the chunk- or "
                         "panel-grid LGS kernel (locality-order the graph "
                         "or pass bit_pack=False)")

    def nbr_max(x):
        if use_chunks:   # structure stream, x+out VMEM-resident
            return spmm_mod._bsr_nbr_max_chunks(
                arrs["ind_vals"], arrs["ind_rows"], arrs["ind_cols"], x,
                n_rows, ibs, interpret=interp, bitmap=bmp)[:n]
        if use_panels:   # panel-resident x window/output — any N
            return spmm_mod._bsr_nbr_max_panels(
                arrs["ind_vals"], arrs["panel_ptr"], arrs["win_start"],
                arrs["ind_rows"], arrs["ind_cols"], x, n_rows, ibs,
                pans.panel_rows, pans.win_blocks, pans.n_panels,
                interpret=interp, bitmap=bmp)[:n]
        return spmm_mod._bsr_nbr_max(arrs["ind_vals"], arrs["ind_rows"],
                                     arrs["ind_cols"], x, n_rows, ibs,
                                     interpret=interp)[:n]

    def cond(state):
        sel, r = state
        return (r < cap) & jnp.any(sel == -1)

    def body(state):
        sel, r = state
        remain = sel == -1
        rr = jnp.where(remain, ranks, -1.0)
        m = nbr_max(rr)        # no-neighbor sentinel << any rank
        win = remain & (ranks > m)
        hit = nbr_max(win.astype(jnp.float32)) > 0.0
        excl = remain & ~win & hit
        sel = jnp.where(win, jnp.int8(1), sel)
        sel = jnp.where(excl, jnp.int8(0), sel)
        return sel, r + 1

    sel, rounds = jax.lax.while_loop(cond, body, (sel0, jnp.int32(0)))
    util = jnp.sum(jnp.where(sel == 1, wts, 0.0))
    return sel, util, rounds


def params_to_list(params) -> list:
    """ChebGCN param tree {'gc1': {...}, ...} -> ordered per-layer list."""
    n = len(params)
    return [params[f"gc{i + 1}"] for i in range(n)]


def make_large_solve(graph: LargeGraph,
                     feature_size: int = 1, max_degree: int = 1,
                     predict: str = "mwis", final_act_same: bool = False,
                     with_baseline: bool = False):
    """Jitted end-to-end solve(params_list, wts) on one large graph.

    Returns (sel [n_pad] int8, util, greedy-baseline util or 0) — the large-N
    analog of `pipeline.make_solve_pipeline`.
    """
    final_act = leaky_relu02 if final_act_same else identity
    arrs0 = graph_arrays(graph)

    @jax.jit
    def _solve(arrs, params_list, wts):
        mask = arrs["mask"]
        m = mask.astype(wts.dtype)
        if predict == "mwis":
            feats = jnp.full((graph.n_pad, feature_size), 1.0 / feature_size,
                             wts.dtype) * m[:, None]
        else:
            norm = jnp.max(jnp.abs(wts) * m) + 1e-9
            feats = jnp.repeat((wts / norm)[:, None], feature_size, axis=1)
            feats = feats * m[:, None]
        out = large_gcn_forward(graph, params_list, feats,
                                final_act=final_act, max_degree=max_degree,
                                arrs=arrs)
        act = out[:, 0] * m
        gcn_wts = act * wts if predict == "mwis" else act
        if graph.use_pallas:
            def lgs(w):
                return bsr_lgs(graph, arrs, w, mask)
        else:
            def lgs(w):
                return ell_lgs(arrs["ell_cols"], arrs["ell_valid"], w, mask)
        sel, _, _ = lgs(gcn_wts)
        util = jnp.sum(jnp.where(sel == 1, wts, 0.0))
        if not with_baseline:
            return sel, util, jnp.zeros_like(util)
        gsel, gutil, _ = lgs(wts * m)
        return sel, util, gutil

    def solve(params_list, wts):
        return _solve(arrs0, params_list, wts)

    solve.jitted = _solve
    return solve


def make_large_closed_loop(graph: LargeGraph,
                           timeslots: int, load: float = 0.9,
                           rate_lo: float = 0.0, rate_hi: float = 100.0,
                           wt_sel: str = "qr", feature_size: int = 1,
                           max_degree: int = 1, predict: str = "mwis",
                           feature_mode: str = "gdpg"):
    """City-scale closed-loop scheduling: a whole T-slot episode on ONE
    large conflict graph, device-resident (the large-N analog of
    `sim.device_sim.make_closed_loop`).

    Per slot inside one `lax.scan`: Poisson arrivals, truncated-Gaussian
    link rates (wireless_dqn_test.py:179-194 traffic model), `wt_sel`
    utilities, GCN scoring through the Pallas BSR forward, BSR-LGS solve,
    queue departures. BSR blocks/neighbor lists stay in HBM across the
    episode — zero host traffic per slot.

    Returns run(params_list, queue0, key) ->
      (queueT [n_pad], {"avg_queue_len", "avg_utility", "sched_rate"}).
    """
    from distgcn_tpu.sim.device_sim import (slot_utilities,
                                            make_poisson_arrivals)

    arrival_rate = 0.5 * (rate_lo + rate_hi) * load
    draw_arrivals = make_poisson_arrivals(arrival_rate)
    mean_r = 0.5 * (rate_lo + rate_hi)
    std_r = 0.25 * (rate_hi - rate_lo)
    final_act = identity
    arrs0 = graph_arrays(graph)

    # weight-independent features (mwis + gdpg): the GCN activation is
    # loop-invariant — hoist it EXPLICITLY out of the episode scan rather
    # than relying on XLA LICM of the 20 chained Pallas custom-calls
    # (observed not to hoist with the r5 panel kernels: 13.2 ms/slot
    # instead of ~6)
    hoist_gcn = predict == "mwis" and feature_mode != "dqn"

    @jax.jit
    def run(arrs, params_list, queue0, key):
        mask = arrs["mask"]
        m = mask.astype(jnp.float32)

        def lgs(w):
            if graph.use_pallas:
                return bsr_lgs(graph, arrs, w, mask)
            return ell_lgs(arrs["ell_cols"], arrs["ell_valid"], w, mask)

        act_h = None
        if hoist_gcn:
            feats = jnp.full((graph.n_pad, feature_size),
                             1.0 / feature_size, jnp.float32) * m[:, None]
            out = large_gcn_forward(graph, params_list, feats,
                                    final_act=final_act,
                                    max_degree=max_degree, arrs=arrs)
            act_h = out[:, 0] * m

        def body(carry, _):
            queue, key = carry
            key, ka, kr = jax.random.split(key, 3)
            arrivals = draw_arrivals(ka, queue.shape,
                                      queue.dtype) * m
            rates = jax.random.normal(kr, queue.shape) * std_r + mean_r
            rates = jnp.clip(jnp.trunc(rates), rate_lo, rate_hi) * m
            queue = queue + arrivals
            wts = slot_utilities(queue[None], rates[None], wt_sel)[0] * m
            if hoist_gcn:
                act = act_h
            else:
                if predict == "mwis":
                    feats = jnp.full((graph.n_pad, feature_size),
                                     1.0 / feature_size, jnp.float32)
                    feats = feats * ((wts != 0).astype(jnp.float32)
                                    * m)[:, None]
                else:
                    norm = jnp.max(jnp.abs(wts) * m) + 1e-9
                    feats = jnp.repeat((wts / norm)[:, None], feature_size,
                                       axis=1) * m[:, None]
                out = large_gcn_forward(graph, params_list, feats,
                                        final_act=final_act,
                                        max_degree=max_degree, arrs=arrs)
                act = out[:, 0] * m
            gcn_wts = act * wts if predict == "mwis" else act
            sel, _, _ = lgs(gcn_wts)
            on = (sel == 1).astype(queue.dtype)
            departures = jnp.minimum(queue, rates * on)
            queue = queue - departures
            slot = {"queue_sum": jnp.sum(queue * m),
                    "util": jnp.sum(jnp.where(sel == 1, wts, 0.0)),
                    "nsched": jnp.sum(on)}
            return (queue, key), slot

        (queue, _), slots = jax.lax.scan(body, (queue0, key), None,
                                         length=timeslots)
        nreal = jnp.maximum(jnp.sum(m), 1.0)
        metrics = {
            "avg_queue_len": jnp.mean(slots["queue_sum"]) / nreal,
            "avg_utility": jnp.mean(slots["util"]),
            "sched_rate": jnp.mean(slots["nsched"]) / nreal,
        }
        return queue, metrics

    def runner(params_list, queue0, key):
        return run(arrs0, params_list, queue0, key)

    runner.jitted = run
    return runner


def serpentine_order(xy: np.ndarray, tile: int = 256) -> np.ndarray:
    """Boustrophedon (serpentine) tile ordering for coordinate graphs.

    Nodes are cut into equal-count horizontal bands (by y rank), each band
    sorted by x with alternating direction, so consecutive index ranges of
    `tile` nodes form compact spatial tiles and a tile's conflict partners
    sit within a BOUNDED block-column window (~2 bands): unlike RCM, whose
    band — and with it the per-edge touched-block count — widens with N
    (measured: 13.1 vs 9.9 blocks/block-row at N=262k, bs=256), and unlike
    Morton, whose quadrant jumps blow the contiguous panel window
    (`ops.spmm.bsr_panels`) to the full matrix width. Returns the
    permutation (new index -> old index) like reverse_cuthill_mckee.
    """
    n = xy.shape[0]
    g = max(int(round(np.sqrt(max(n // tile, 1)))), 1)
    yrank = np.empty(n, np.int64)
    yrank[np.argsort(xy[:, 1], kind="stable")] = np.arange(n)
    band = np.minimum(yrank * g // n, g - 1)
    x = xy[:, 0].copy()
    flip = band % 2 == 1
    x[flip] = -x[flip]                     # serpentine: odd bands reversed
    return np.lexsort((x, band))


def geometric_conflict_graph(n: int, avg_degree: float = 24.0,
                             seed: int = 0, weight_dist: str = "uniform",
                             order: str = "rcm"):
    """Synthetic city-scale conflict graph with locality ordering.

    Links dropped uniformly in the unit square; two links conflict when
    closer than the radius giving the target average degree (the Poisson
    interference model of data/wireless.py at scale). Nodes are reordered so
    conflicts concentrate near the diagonal — the locality ordering the BSR
    layout wants. order='rcm' (reverse Cuthill-McKee; bandwidth ~ n*r, the
    densest blocks) or 'morton' (space-filling key; cheaper to compute,
    sparser blocks). Returns (adj csr, wts, xy).
    """
    rng = np.random.default_rng(seed)
    xy = rng.random((n, 2))
    r = np.sqrt((avg_degree + 1) / (np.pi * n))
    from scipy.spatial import cKDTree
    tree = cKDTree(xy)
    pairs = tree.query_pairs(r, output_type="ndarray")
    data = np.ones(len(pairs), np.float32)
    adj = sp.coo_matrix((data, (pairs[:, 0], pairs[:, 1])), shape=(n, n))
    adj = (adj + adj.T).tocsr()
    if order == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        perm = reverse_cuthill_mckee(adj, symmetric_mode=True)
    elif order == "grid":
        perm = serpentine_order(xy, tile=256)
    else:  # morton
        gx = np.minimum((xy[:, 0] * 1024).astype(np.int64), 1023)
        gy = np.minimum((xy[:, 1] * 1024).astype(np.int64), 1023)

        def _spread(v):
            v = (v | (v << 16)) & 0x0000FFFF0000FFFF
            v = (v | (v << 8)) & 0x00FF00FF00FF00FF
            v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
            v = (v | (v << 2)) & 0x3333333333333333
            v = (v | (v << 1)) & 0x5555555555555555
            return v

        perm = np.argsort(_spread(gx) | (_spread(gy) << 1), kind="stable")
    adj = adj[perm][:, perm].tocsr()
    xy = xy[perm]
    if weight_dist == "uniform":
        wts = rng.random(n).astype(np.float32)
    else:
        wts = np.abs(rng.normal(size=n)).astype(np.float32)
    return adj, wts, xy

"""Fused Pallas TPU kernel for Local Greedy Search (LGS).

The XLA version (`ops/lgs.batched_lgs`) re-streams the [B, N, N] adjacency
from HBM on every synchronized round (~6 rounds typical on GEN21-class
conflict graphs), so the solver is HBM-bound. This kernel runs the *entire*
multi-round solve per graph with the adjacency resident in VMEM:

- grid over graphs, one program per graph;
- the int8 adjacency block ([N, N], 64 KB at N=256) is DMA'd to VMEM once
  and cast to f32 in a VMEM scratch once per graph;
- the round recurrence runs as a `lax.while_loop` of pure VPU ops on that
  resident block. Like the XLA path, nodes are pre-ranked by the total order
  (w, -id) (heuristics.py:106-111 tie-break), so each round is just TWO
  [N, N] masked-reduce passes: max remaining-neighbor rank, and
  winner-neighbor exclusion — no tie machinery;
- HBM traffic = one adjacency read total instead of one per round, and
  each graph runs only ITS OWN rounds (the XLA batch runs every graph to
  the batch max).

Semantics are bit-identical to `batched_lgs` (same win rule: lexicographic
key (w, -id) strictly greater than every remaining neighbor's), verified by
tests/test_lgs_pallas.py on randomized and engineered-tie graphs.

Mosaic constraints found empirically (kept as guardrails):
- never transpose or sublane-broadcast i1 vectors — transpose ints/floats
  and derive booleans afterwards;
- never compare i8 to produce an [N, N] i1 feeding a select — cast i8->f32
  first and compare in f32;
- materialize [1, N] -> [N, N] broadcasts of select operands explicitly.

N must be a multiple of 128 (guaranteed by `core.graph.pad_bucket`);
`fused_lgs` falls back to the XLA path otherwise or on non-TPU backends.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distgcn_tpu.ops.lgs import batched_lgs, lgs_ranks


def _lgs_kernel(adj_ref, rank_ref, mask_ref, sel_ref, rounds_ref, af_ref,
                *, cap):
    n = adj_ref.shape[-1]
    r_c = rank_ref[0]                                       # [1, N] f32
    r_v = jnp.transpose(r_c)                                # [N, 1]
    m_c = mask_ref[0].astype(jnp.int32)                     # [1, N]

    # adjacency: i8 -> f32 once per graph (Mosaic rejects i8->i1 compares
    # feeding selects; f32 compares are fine)
    af_ref[:] = adj_ref[0].astype(jnp.float32)

    # sel: [N, 1] int32 in {-1 remaining, 0 excluded, 1 selected}
    # (transpose ints only; Mosaic cannot relayout transposed i1 vectors)
    sel0 = jnp.where(jnp.transpose(m_c) != 0, jnp.int32(-1), jnp.int32(0))

    def cond(state):
        sel, r = state
        return jnp.logical_and(r < cap, jnp.any(sel == -1))

    def body(state):
        sel, r = state                                      # [N, 1] int32
        a = af_ref[:]                                       # [N, N] 0/1 f32
        sel_c = jnp.transpose(sel)                          # [1, N] int32
        remain_v = sel == -1                                # [N, 1]
        remain_c = sel_c == -1                              # [1, N]
        # ranks of remaining nodes, -1 where gone (ranks are >= 1)
        rr_c = jnp.where(remain_c, r_c, -1.0)               # [1, N]
        nbr_r = jnp.where(a > 0.5, jnp.broadcast_to(rr_c, (n, n)), -1.0)
        mx = jnp.max(nbr_r, axis=1, keepdims=True)          # [N, 1]
        # no remaining neighbor -> mx = -1 < rank: neighborless nodes win
        win_v = jnp.logical_and(remain_v, r_v > mx)         # [N, 1]
        win_i = jnp.where(win_v, jnp.int32(1), jnp.int32(0))
        win_c = jnp.transpose(win_i)                        # [1, N] int32
        nbr_win = jnp.max(jnp.where(a > 0.5,
                                    jnp.broadcast_to(win_c, (n, n)), 0),
                          axis=1, keepdims=True) > 0        # [N, 1]
        excl_v = remain_v & jnp.logical_not(win_v) & nbr_win
        sel = jnp.where(win_v, jnp.int32(1), sel)
        sel = jnp.where(excl_v, jnp.int32(0), sel)
        return sel, r + 1

    sel, rounds = jax.lax.while_loop(cond, body, (sel0, jnp.int32(0)))
    sel_ref[0] = jnp.transpose(sel)                         # [1, N]
    rounds_ref[0, 0, 0] = rounds


@functools.partial(jax.jit, static_argnames=("max_rounds", "interpret"))
def batched_lgs_pallas(adj: jnp.ndarray, wts: jnp.ndarray, mask: jnp.ndarray,
                       max_rounds: Optional[int] = None,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pallas LGS over a padded batch.

    Args match `ops.lgs.batched_lgs`; adj may be any numeric/bool dtype
    (int8 recommended: 4x less HBM+VMEM than f32). Returns
    (sel [B,N] int8, util [B] f32, rounds [B] int32 — per-graph, where the
    XLA path returns the batch max).
    """
    b, n = wts.shape
    if n % 128 != 0:
        raise ValueError(f"N={n} must be a multiple of 128 (pad_bucket)")
    cap = n if max_rounds is None else int(max_rounds)
    adj8 = adj.astype(jnp.int8)
    wts32 = wts.astype(jnp.float32)
    mask8 = mask.astype(jnp.int8)
    # ranks in [1, n] are exactly representable in f32 for any practical n
    ranks = lgs_ranks(wts32).astype(jnp.float32)

    sel, rounds = pl.pallas_call(
        functools.partial(_lgs_kernel, cap=cap),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        interpret=interpret,
    )(adj8, ranks[:, None, :], mask8[:, None, :])
    sel = sel[:, 0, :]
    util = jnp.sum(jnp.where(sel == 1, wts32, 0.0), axis=-1)
    return sel.astype(jnp.int8), util, rounds[:, 0, 0]


def fused_lgs(adj: jnp.ndarray, wts: jnp.ndarray, mask: jnp.ndarray,
              max_rounds: Optional[int] = None
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch: Pallas on TPU when shapes allow, XLA elsewhere.

    Return contract matches `batched_lgs` (rounds is scalar batch-max).
    """
    n = wts.shape[-1]
    if jax.default_backend() == "tpu" and n % 128 == 0:
        sel, util, rounds = batched_lgs_pallas(adj, wts, mask, max_rounds)
        return sel, util, jnp.max(rounds)
    return batched_lgs(adj, wts, mask, max_rounds)

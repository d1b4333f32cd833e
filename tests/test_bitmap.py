"""Bitmap-packed structure stream (1 bit/cell) vs int8 — exact equality.

The pack layout (`ops.spmm.pack_bits_blocks`: rows along sublanes, bit
i%32 of word [i//32, j] = cell (i, j)) and the in-kernel `_unpack_bits`
expansion must be exact inverses; every kernel pair (int8 vs bitmap) must
produce identical results since the unpacked values are exactly 0/1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distgcn_tpu.large import (build_large_graph, geometric_conflict_graph,
                               make_large_solve)
from distgcn_tpu.ops import spmm as S


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    blk = (rng.random((3, 64, 64)) < 0.07).astype(np.int8)
    packed = S.pack_bits_blocks(blk)
    assert packed.shape == (3, 2, 64) and packed.dtype == np.int32
    for b in range(3):
        got = np.asarray(jax.jit(
            lambda w: S._unpack_bits(w, 64, jnp.float32))(packed[b]))
        np.testing.assert_array_equal(got, blk[b].astype(np.float32))


def test_bsr_panels_bits_matches_int8():
    import scipy.sparse as sp
    adj, _, _ = geometric_conflict_graph(600, avg_degree=12.0, seed=3)
    a = sp.csr_matrix(adj)
    p8 = S.bsr_panels(a, block_size=64, dtype=np.int8)
    pb = S.bsr_panels(a, block_size=64, dtype="bits")
    assert pb.bsr.bitmap and not p8.bsr.bitmap
    assert np.array_equal(np.asarray(p8.bsr.blk_rows),
                          np.asarray(pb.bsr.blk_rows))
    # word-level equality against a host pack of the int8 stream
    np.testing.assert_array_equal(
        np.asarray(pb.bsr.blk_vals),
        S.pack_bits_blocks(np.asarray(p8.bsr.blk_vals)))


@pytest.mark.parametrize("nl", [1, 3])
def test_bitmap_solve_matches_int8_solve(nl):
    """End-to-end large solve: bitmap stream == int8 stream exactly (the
    unpacked operand is identical 0/1, so numerics are bit-equal)."""
    adj, wts, _ = geometric_conflict_graph(800, avg_degree=10.0, seed=9)
    plist = [{"w_0": jnp.full((1, 1), 0.5), "w_1": jnp.full((1, 1), 0.8),
              "bias": jnp.full((1,), 0.1)}] * nl

    outs = []
    for bit_pack in (False, True):
        g = build_large_graph(adj, block_size=128, use_pallas=True,
                              interpret=True, ind_block_size=128,
                              bit_pack=bit_pack)
        assert g.bitmap == bit_pack
        solve = make_large_solve(g)
        w = np.zeros(g.n_pad, np.float32)
        w[: g.n] = wts
        sel, util, _ = solve(plist, jnp.asarray(w))
        outs.append((np.asarray(sel), float(util)))
    assert np.array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]

"""Distributed LGS ranking (parallel/halo.distributed_lgs_ranks) and the
int32 neighbor-max kernel — the pieces that removed the sharded solvers'
replicated full-N argsort and the 2^24 f32 rank cap (heuristics.py:106-111
tie-break preserved exactly)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from distgcn_tpu.parallel.halo import AXIS, distributed_lgs_ranks
from distgcn_tpu.ops.lgs import lgs_ranks


def _mesh():
    devs = jax.devices()
    return Mesh(np.array(devs), (AXIS,)), len(devs)


def _dist_ranks(w, d, mesh):
    f = shard_map(lambda wl: distributed_lgs_ranks(wl, d), mesh=mesh,
                  in_specs=P(AXIS), out_specs=P(AXIS))
    return np.asarray(jax.jit(f)(jnp.asarray(w)))


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_lgs_ranks_with_cross_shard_ties(seed):
    mesh, d = _mesh()
    rng = np.random.default_rng(seed)
    n = d * 96
    w = rng.random(n).astype(np.float32)
    # heavy ties spanning shards, including runs of identical values
    w[rng.integers(0, n, 50)] = 0.5
    w[rng.integers(0, n, 25)] = 0.25
    w[: d * 2] = 0.75          # a tie in every shard's first rows
    got = _dist_ranks(w, d, mesh)
    ref = np.asarray(lgs_ranks(jnp.asarray(w[None]))[0])
    np.testing.assert_array_equal(got, ref)


def test_all_equal_weights():
    mesh, d = _mesh()
    n = d * 32
    w = np.full(n, 0.125, np.float32)
    got = _dist_ranks(w, d, mesh)
    # (w, -id) order with equal w = ascending id wins: rank n for id 0
    np.testing.assert_array_equal(got, np.arange(n, 0, -1))


@pytest.mark.slow
def test_exact_past_2_24():
    """f32 ranks collapsed above 2^24 (the old cap); int32 distributed
    ranks stay exact. Checks the extreme ids where f32 rounding would
    merge adjacent ranks."""
    mesh, d = _mesh()
    n_loc = (1 << 24) // d + 128        # n = 2^24 + d*128 > 2^24
    n = n_loc * d
    rng = np.random.default_rng(2)
    w = rng.random(n).astype(np.float32)
    got = _dist_ranks(w, d, mesh)
    assert got.min() == 1 and got.max() == n
    # spot-check 1000 nodes against the numpy oracle rank
    order = np.argsort(-w, kind="stable")
    ref = np.empty(n, np.int64)
    ref[order] = np.arange(n)
    ref = n - ref
    pick = rng.integers(0, n, 1000)
    np.testing.assert_array_equal(got[pick], ref[pick])
    # the f32 representation would have collapsed some of these:
    as_f32 = got.astype(np.float32).astype(np.int64)
    assert (as_f32 != got).any()


def test_i32_nbr_max_kernel_matches_dense():
    import scipy.sparse as sp
    from distgcn_tpu.ops import spmm as S
    rng = np.random.default_rng(3)
    a = sp.random(384, 384, 0.04, random_state=4, format="csr")
    a = ((a + a.T) > 0).astype(np.float32)
    a.setdiag(0)
    a.eliminate_zeros()
    b = S.BsrMatrix.from_scipy(a, 128, dtype=np.int8)
    x = rng.integers(-5, 1 << 28, 384).astype(np.int32)   # beyond f32 range
    got = S._bsr_nbr_max_rows_i32(b.blk_vals, S.bsr_row_ptr(b), b.blk_cols,
                                  jnp.asarray(x), b.n_rows, 128,
                                  interpret=True)
    dense = a.toarray() != 0
    oracle = np.where(dense, x[None, :], S._I32_SENT).max(1)
    np.testing.assert_array_equal(np.asarray(got)[:384], oracle)

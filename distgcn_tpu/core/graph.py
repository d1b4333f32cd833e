"""Graph containers for TPU execution.

The reference feeds one scipy-sparse graph per `sess.run`
(`mwis_gdpg_call.py:690-694`). On TPU we instead use **fixed-shape dense
padded batches**: conflict graphs are small (N ~ 100..1000,
`wireless_dqn_test.py:160-163` prints avg degree ~ 10-25), so a dense
[B, N, N] adjacency turns every support application into an MXU matmul and
makes LGS rounds a masked vector reduction — no gather/scatter, no dynamic
shapes, one compilation per padding bucket.

`GraphBatch` is a pytree; all fields are arrays:
    adj  : [B, N, N] float  symmetric 0/1, zero diagonal, zero padding
    wts  : [B, N]    float  node weights (padding = 0)
    mask : [B, N]    bool   True for real nodes
    nn   : [B]       int32  number of real nodes per graph
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Union

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


def pad_bucket(n: int, bucket: int = 128) -> int:
    """Round n up to a multiple of `bucket` (MXU/VPU lane alignment)."""
    return int(max(bucket, -(-n // bucket) * bucket))


def graph_fingerprint(adj) -> tuple:
    """Cheap content key for caching device graph batches across timeslots
    (the wireless engine re-presents the SAME conflict graph every slot but
    as possibly-new scipy objects). O(nnz) hashing — orders of magnitude
    cheaper than re-uploading/densifying the graph."""
    a = adj if sp.issparse(adj) else sp.csr_matrix(np.asarray(adj))
    a = a.tocsr()
    return (a.shape[0], int(a.nnz), hash(a.indptr.tobytes()),
            hash(a.indices.tobytes()))


@functools.partial(jax.jit, static_argnames=("n",))
def _dense_from_edges(edges: jnp.ndarray, n: int) -> jnp.ndarray:
    """Densify a padded upper-triangular edge list [B, E, 2] on device.

    Padding rows are (0, 0) — they scatter onto the diagonal, which is
    zeroed afterwards (conflict graphs have no self-loops).

    The batch adjacency PERSISTS as int8 0/1 (VERDICT r3 #7): conflict
    structure needs one byte, not four — 4x less HBM footprint and stream
    for every consumer that reads structure (`batched_lgs` adjacency,
    support builds, feature masks). Numeric consumers cast at their
    boundary (`core.prep.normalize_adj_dense`).
    """
    b, e, _ = edges.shape
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (b, e), 0)
    adj = jnp.zeros((b, n, n), jnp.int8)
    adj = adj.at[b_idx, edges[..., 0], edges[..., 1]].set(1)
    adj = jnp.maximum(adj, jnp.swapaxes(adj, -1, -2))
    diag = jnp.eye(n, dtype=bool)
    return jnp.where(diag, jnp.int8(0), adj)


@jax.tree_util.register_pytree_node_class
class GraphBatch:
    """A fixed-shape batch of padded graphs (pytree of arrays)."""

    def __init__(self, adj, wts, mask, nn):
        self.adj = adj
        self.wts = wts
        self.mask = mask
        self.nn = nn

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.adj, self.wts, self.mask, self.nn), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- shape info ---------------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.adj.shape[0]

    @property
    def pad_n(self) -> int:
        return self.adj.shape[-1]

    def __repr__(self):
        return f"GraphBatch(B={self.batch_size}, N={self.pad_n})"

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_scipy(cls, adjs: Sequence[Union[sp.spmatrix, np.ndarray]],
                   wts: Sequence[np.ndarray], pad_to: int = 0,
                   bucket: int = 128, dtype=np.float32) -> "GraphBatch":
        """Build a batch from per-graph scipy/np adjacencies + weight vectors.

        The adjacency is shipped to the device as a padded **edge list**
        (nnz*8 bytes instead of N*N*4) and densified on device — host->device
        bandwidth, not compute, is the limiting factor for cold graphs.
        """
        if not isinstance(adjs, (list, tuple)):
            adjs = [adjs]
            wts = [wts]
        sizes = [a.shape[0] for a in adjs]
        n = pad_to or pad_bucket(max(sizes), bucket)
        if n < max(sizes):
            raise ValueError(f"pad_to={n} < largest graph {max(sizes)}")
        b = len(adjs)
        w = np.zeros((b, n), dtype=dtype)
        mask = np.zeros((b, n), dtype=bool)
        edge_lists = []
        for i, (a, wt) in enumerate(zip(adjs, wts)):
            ni = a.shape[0]
            if sp.issparse(a):
                coo = a.tocoo()
                keep = coo.row < coo.col
                ei, ej = coo.row[keep], coo.col[keep]
            else:
                ei, ej = np.nonzero(np.triu(np.asarray(a), k=1))
            edge_lists.append((ei.astype(np.int32), ej.astype(np.int32)))
            w[i, :ni] = np.asarray(wt, dtype=dtype).flatten()[:ni]
            mask[i, :ni] = True
        e_max = max((e[0].size for e in edge_lists), default=1) or 1
        # bucket the edge-count dimension so the densify kernel compiles a
        # bounded number of shape variants
        e_max = pad_bucket(e_max, 512)
        edges = np.zeros((b, e_max, 2), dtype=np.int32)
        for i, (ei, ej) in enumerate(edge_lists):
            edges[i, : ei.size, 0] = ei
            edges[i, : ei.size, 1] = ej
        adj = _dense_from_edges(jnp.asarray(edges), n)
        return cls(adj, jnp.asarray(w), jnp.asarray(mask),
                   jnp.asarray(sizes, dtype=jnp.int32))

    @classmethod
    def single(cls, adj, wts, pad_to: int = 0, bucket: int = 128,
               dtype=np.float32) -> "GraphBatch":
        return cls.from_scipy([adj], [wts], pad_to=pad_to, bucket=bucket,
                              dtype=dtype)

    # -- conversions --------------------------------------------------------
    def to_scipy(self) -> List[sp.csr_matrix]:
        adj = np.asarray(self.adj)
        nn = np.asarray(self.nn)
        return [sp.csr_matrix(adj[i, : nn[i], : nn[i]])
                for i in range(self.batch_size)]


def block_diag_stack(adjs: Sequence[sp.spmatrix]) -> sp.csr_matrix:
    """Block-diagonal stack of adjacencies (reference `dstack`,
    gcn/utils.py:315-322, generalized to k graphs)."""
    return sp.block_diag([sp.csr_matrix(a) for a in adjs]).tocsr()


def edges_from_dense(adj: np.ndarray):
    """Upper-triangular edge list (i, j) arrays from a dense adjacency."""
    iu, ju = np.nonzero(np.triu(np.asarray(adj), k=1))
    return iu, ju

"""Graph preprocessing: normalization and polynomial support construction.

Re-derivation of the semantics of the reference's `gcn/utils.py`:

- ``normalize_adj``        (gcn/utils.py:120-128): symmetric normalization
  ``(A D^-1/2)^T D^-1/2`` with 0 for isolated nodes (inf -> 0).
- ``simple_polynomials``   (gcn/utils.py:258-274): supports [I, L, L^2, .. L^K]
  with ``L = I - normalize_adj(A)`` — **no self loops added** (unlike
  ``preprocess_adj`` gcn/utils.py:130-135). This is the support set actually
  used at runtime by every agent (mwis_gdpg_call.py:95).
- ``chebyshev_polynomials`` (gcn/utils.py:235-255): scaled-Laplacian Chebyshev
  recurrence.
- ``preprocess_features``  (gcn/utils.py:98-106): row normalization with
  divide-by-zero -> 0.

Two implementations are provided:

* scipy/numpy versions (suffix-free) for host-side parity and tests;
* dense jnp versions (``*_dense``) used on device — conflict graphs are small
  (N ~ 1e2..1e3), so dense [N, N] supports ride the MXU and batch trivially to
  ``[B, K+1, N, N]``. Padding rows/cols are all-zero, which the normalization
  maps to all-zero rows (isolated-node rule), so padded and unpadded results
  agree on the real block.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Host (scipy) versions — bit-parity with the reference semantics
# ---------------------------------------------------------------------------

def normalize_adj(adj) -> sp.coo_matrix:
    """Symmetric normalization D^-1/2 A D^-1/2 (gcn/utils.py:120-128)."""
    adj = sp.coo_matrix(adj)
    rowsum = np.array(adj.sum(1)).flatten()
    with np.errstate(divide="ignore"):
        d_inv_sqrt = np.power(rowsum, -0.5)
    d_inv_sqrt[np.isinf(d_inv_sqrt)] = 0.0
    d = sp.diags(d_inv_sqrt)
    # (A @ D^-1/2)^T @ D^-1/2 == D^-1/2 A^T D^-1/2; A symmetric in all uses.
    return adj.dot(d).transpose().dot(d).tocoo()


def preprocess_adj(adj) -> sp.coo_matrix:
    """normalize_adj(A + I) (gcn/utils.py:130-135)."""
    return normalize_adj(adj + sp.eye(adj.shape[0]))


def laplacian_support(adj) -> sp.csr_matrix:
    """L = I - normalize_adj(A)."""
    return (sp.eye(adj.shape[0]) - normalize_adj(adj)).tocsr()


def simple_polynomials(adj, k: int):
    """[I, L, L^2, ..., L^k] with L = I - normalize_adj(A) (gcn/utils.py:258-274)."""
    lap = laplacian_support(adj)
    t_k = [sp.eye(adj.shape[0]).tocsr(), lap]
    for _ in range(2, k + 1):
        t_k.append(t_k[-1] @ lap)
    return t_k[: k + 1]


def chebyshev_polynomials(adj, k: int):
    """Chebyshev recurrence on the scaled Laplacian (gcn/utils.py:235-255)."""
    from scipy.sparse.linalg import eigs

    lap = laplacian_support(adj)
    largest_eigval, _ = eigs(lap, 1, which="LR", maxiter=5000)
    scaled_lap = (2.0 / largest_eigval[0].real) * lap - sp.eye(adj.shape[0])
    t_k = [sp.eye(adj.shape[0]).tocsr(), scaled_lap.tocsr()]
    for _ in range(2, k + 1):
        t_k.append(2.0 * (scaled_lap @ t_k[-1]) - t_k[-2])
    return t_k[: k + 1]


def plain_polynomials(adj, k: int):
    """[I, I - A, (I - A)^2, ...] — unnormalized (gcn/utils.py:325-340)."""
    lap = (sp.eye(adj.shape[0]) - adj).tocsr()
    t_k = [sp.eye(adj.shape[0]).tocsr(), lap]
    for _ in range(2, k + 1):
        t_k.append(t_k[-1] @ lap)
    return t_k[: k + 1]


def preprocess_features(features: np.ndarray) -> np.ndarray:
    """Row-normalize; rows summing to 0 stay 0 (gcn/utils.py:98-106)."""
    features = np.asarray(features, dtype=np.float64)
    rowsum = features.sum(axis=1)
    with np.errstate(divide="ignore"):
        r_inv = np.power(rowsum, -1.0)
    r_inv[np.isinf(r_inv)] = 0.0
    return (features * r_inv[:, None]).astype(np.float32)


def sparse_to_tuple(mx):
    """COO tuple (coords, values, shape) — the reference feed format
    (gcn/utils.py:79-95). Kept for dataset/interop tooling."""
    mx = sp.coo_matrix(mx)
    coords = np.vstack((mx.row, mx.col)).transpose()
    return coords, mx.data, mx.shape


# ---------------------------------------------------------------------------
# Device (dense jnp) versions — batched, jit/vmap friendly
# ---------------------------------------------------------------------------

def normalize_adj_dense(adj: jnp.ndarray) -> jnp.ndarray:
    """Symmetric normalization of a dense [..., N, N] adjacency.

    Isolated (or padding) nodes have zero degree -> their rows/cols are zero,
    matching the host rule inf -> 0.

    Accepts int8 structure (the `GraphBatch` persistent form) or float;
    normalization math always runs f32.
    """
    if adj.dtype != jnp.float32:
        adj = adj.astype(jnp.float32)
    deg = jnp.sum(adj, axis=-1)
    # 1/sqrt rather than lax.rsqrt: the TPU rsqrt approximation costs ~4e-4
    # relative error, which breaks activation parity with the reference.
    d_inv_sqrt = jnp.where(deg > 0, 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-30)), 0.0)
    return adj * d_inv_sqrt[..., :, None] * d_inv_sqrt[..., None, :]


def simple_polynomials_dense(adj: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stack [I, L, L^2, ..., L^k] -> [..., k+1, N, N] for dense adjacency.

    Note: on padded graphs, L's diagonal is 1 only where the node has degree
    > 0 after ``I - normalize_adj``; here we keep I's full diagonal to match
    ``sp.eye`` on the real block. Padding rows of L equal the identity rows of
    I... they do NOT: reference L = I - Anorm has 1 on EVERY diagonal entry
    (isolated nodes included). We therefore use the full identity.
    """
    if adj.dtype != jnp.float32:     # int8 GraphBatch structure
        adj = adj.astype(jnp.float32)
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=adj.dtype)
    eye = jnp.broadcast_to(eye, adj.shape)
    lap = eye - normalize_adj_dense(adj)
    mats = [eye, lap]
    for _ in range(2, k + 1):
        mats.append(jnp.matmul(mats[-1], lap,
                               precision=jax.lax.Precision.HIGHEST))
    return jnp.stack(mats[: k + 1], axis=-3)


def masked_simple_polynomials_dense(adj: jnp.ndarray, mask: jnp.ndarray,
                                    k: int) -> jnp.ndarray:
    """Like :func:`simple_polynomials_dense` but zeroes padding rows/cols.

    The reference builds supports on the *unpadded* graph; an identity entry
    on a padding row would inject the padding feature into the output. With a
    masked identity the padded computation restricted to real nodes equals the
    unpadded one (L's off-diagonals never touch padding since adj there is 0).
    """
    if adj.dtype != jnp.float32:     # int8 GraphBatch structure
        adj = adj.astype(jnp.float32)
    n = adj.shape[-1]
    m = mask.astype(adj.dtype)
    eye = jnp.eye(n, dtype=adj.dtype) * m[..., None, :]
    eye = jnp.broadcast_to(eye, adj.shape) * m[..., :, None]
    lap = eye - normalize_adj_dense(adj)
    mats = [eye, lap]
    for _ in range(2, k + 1):
        mats.append(jnp.matmul(mats[-1], lap))
    return jnp.stack(mats[: k + 1], axis=-3)


def preprocess_features_dense(features: jnp.ndarray) -> jnp.ndarray:
    """Row-normalize [..., N, F] with zero-sum rows -> 0."""
    rowsum = jnp.sum(features, axis=-1, keepdims=True)
    inv = jnp.where(rowsum != 0, 1.0 / jnp.where(rowsum == 0, 1.0, rowsum), 0.0)
    return features * inv

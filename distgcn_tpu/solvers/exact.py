"""Exact MWIS solver — native C++ branch & bound with python fallback.

API parity with the reference's `mlp_gurobi` (heuristics.py:327-355):
``mwis_exact(adj, wts, timeout) -> (solution_indices, utility, status)``
with status in {"Optimal", "Timeout"} (the reference returned PuLP status
strings; drivers only check truthiness / log it).

The native kernel (native/mwis_exact.cpp) is compiled on first use with g++
and cached next to the source. It also exports fast host greedy/LGS used by
the wireless simulator's CPU-bound loops (`fast_greedy`, `fast_local_greedy`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "mwis_exact.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libdistgcn_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.isfile(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     _SRC, "-o", _LIB],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB)
            lib.mwis_exact.restype = ctypes.c_int
            lib.mwis_exact.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_double)]
            lib.greedy_mwis.restype = ctypes.c_double
            lib.greedy_mwis.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int8)]
            lib.local_greedy.restype = ctypes.c_int
            lib.local_greedy.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_double)]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def _csr(adj) -> sp.csr_matrix:
    a = adj.tocsr() if sp.issparse(adj) else sp.csr_matrix(np.asarray(adj))
    return a.astype(np.float64)


def _csr_ptrs(a: sp.csr_matrix):
    indptr = np.ascontiguousarray(a.indptr, dtype=np.int32)
    indices = np.ascontiguousarray(a.indices, dtype=np.int32)
    return (indptr, indices,
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))


def mwis_exact(adj, wts, timeout: float = 300.0
               ) -> Tuple[np.ndarray, float, str]:
    """Exact MWIS. Returns (selected indices, utility, status)."""
    a = _csr(adj)
    w = np.ascontiguousarray(np.asarray(wts, dtype=np.float64).flatten())
    n = w.size
    lib = _load_native()
    if lib is not None:
        _, _, p_indptr, p_indices = _csr_ptrs(a)
        sel = np.zeros(n, dtype=np.int8)
        val = ctypes.c_double(0.0)
        status = lib.mwis_exact(
            p_indptr, p_indices,
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            ctypes.c_double(timeout),
            sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            ctypes.byref(val))
        solu = np.nonzero(sel == 1)[0]
        return solu, float(val.value), "Optimal" if status == 0 else "Timeout"
    # python fallback: exact B&B (same algorithm, set-based)
    solu, val, status = _python_bnb(a, w, timeout)
    return solu, val, status


# alias matching the reference name so ported driver code reads naturally
mlp_gurobi = mwis_exact


def fast_greedy(adj, wts) -> Tuple[set, float]:
    """Native greedy_search; falls back to the numpy version."""
    lib = _load_native()
    if lib is None:
        from distgcn_tpu.solvers.greedy import greedy_search
        return greedy_search(adj, wts)
    a = _csr(adj)
    w = np.ascontiguousarray(np.asarray(wts, dtype=np.float64).flatten())
    _, _, p_indptr, p_indices = _csr_ptrs(a)
    sel = np.zeros(w.size, dtype=np.int8)
    val = lib.greedy_mwis(p_indptr, p_indices,
                          w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                          w.size,
                          sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return set(np.nonzero(sel == 1)[0].tolist()), float(val)


def fast_local_greedy(adj, wts) -> Tuple[set, float]:
    """Native local_greedy_search; falls back to the numpy version."""
    lib = _load_native()
    if lib is None:
        from distgcn_tpu.solvers.greedy import local_greedy_search
        return local_greedy_search(adj, wts)
    a = _csr(adj)
    w = np.ascontiguousarray(np.asarray(wts, dtype=np.float64).flatten())
    _, _, p_indptr, p_indices = _csr_ptrs(a)
    sel = np.zeros(w.size, dtype=np.int8)
    val = ctypes.c_double(0.0)
    lib.local_greedy(p_indptr, p_indices,
                     w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                     w.size,
                     sel.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                     ctypes.byref(val))
    return set(np.nonzero(sel == 1)[0].tolist()), float(val.value)


def _python_bnb(a: sp.csr_matrix, w: np.ndarray, timeout: float
                ) -> Tuple[np.ndarray, float, str]:
    import time
    n = w.size
    deadline = time.monotonic() + timeout
    nbrs = [frozenset(a.indices[a.indptr[v]: a.indptr[v + 1]].tolist())
            for v in range(n)]
    # greedy seed
    from distgcn_tpu.solvers.greedy import greedy_search
    seed, seed_val = greedy_search(a, w)
    best = [seed_val - 1e-12, set(seed)]
    timed_out = [False]

    def ub(P):
        return sum(w[v] for v in P if w[v] > 0)

    def rec(P: set, cur: float, sel: set):
        if timed_out[0]:
            return
        if time.monotonic() > deadline:
            timed_out[0] = True
            return
        if not P:
            if cur > best[0]:
                best[0], best[1] = cur, set(sel)
            return
        if cur + ub(P) <= best[0]:
            return
        v = max(P, key=lambda u: (len(nbrs[u] & P), w[u]))
        # include
        rec(P - nbrs[v] - {v}, cur + w[v], sel | {v})
        # exclude
        rec(P - {v}, cur, sel)

    rec(set(range(n)), 0.0, set())
    solu = np.array(sorted(best[1]), dtype=int)
    return solu, float(w[solu].sum() if solu.size else 0.0), \
        "Timeout" if timed_out[0] else "Optimal"


def all_maximal_is(adj) -> list:
    """Enumerate ALL maximal independent sets (reference `get_all_mis`,
    heuristics.py:308-318, which used igraph's
    maximal_independent_vertex_sets). Bron-Kerbosch with pivoting on the
    complement graph (maximal IS of G == maximal cliques of G-complement).
    Exponential in the worst case — intended for the reference's small
    label-generation graphs. Returns a list of sorted node-id lists."""
    a = _csr(adj)
    n = a.shape[0]
    nbrs = [set(a.indices[a.indptr[v]: a.indptr[v + 1]].tolist()) - {v}
            for v in range(n)]
    # complement neighborhoods (co-nbrs = candidates that stay independent)
    allv = set(range(n))
    co = [allv - nbrs[v] - {v} for v in range(n)]
    out = []

    def bk(r: set, p: set, x: set):
        if not p and not x:
            out.append(sorted(r))
            return
        pivot = max(p | x, key=lambda u: len(co[u] & p))
        for v in list(p - co[pivot]):
            bk(r | {v}, p & co[v], x & co[v])
            p.discard(v)
            x.add(v)

    bk(set(), set(range(n)), set())
    return out


def get_mwis(adj, wts) -> Tuple[set, float]:
    """Best maximal IS by total weight via exhaustive enumeration
    (reference `get_mwis`, heuristics.py:320-324)."""
    w = np.asarray(wts, dtype=float).flatten()
    best, best_val = set(), -np.inf
    for mis in all_maximal_is(adj):
        val = float(w[mis].sum())
        if val > best_val:
            best, best_val = set(mis), val
    return best, best_val


def mwis_milp(adj, wts, time_limit: float = 300.0
              ) -> Tuple[np.ndarray, float, str]:
    """Exact MWIS via an independent MIP engine (HiGHS through
    scipy.optimize.milp, edge formulation x_u + x_v <= 1).

    Second, algorithmically unrelated prover used to cross-validate the
    native B&B (`mwis_exact`) — e.g. it adjudicated the six stale rows in
    the reference's recorded BA Gurobi sweep (RESULTS.md). Same return
    contract as `mwis_exact`: (0/1 selection, utility, status).
    """
    from scipy.optimize import milp, LinearConstraint, Bounds

    a = sp.csr_matrix(adj)
    w = np.asarray(wts, dtype=np.float64).flatten()
    n = w.size
    coo = sp.triu(a, 1).tocoo()
    if coo.nnz == 0:
        sel = (w > 0).astype(np.int8)
        return sel, float(w[w > 0].sum()), "Optimal"
    pairs = np.column_stack([coo.row, coo.col]).ravel()
    A = sp.coo_matrix((np.ones(coo.nnz * 2),
                       (np.repeat(np.arange(coo.nnz), 2), pairs)),
                      shape=(coo.nnz, n))
    res = milp(c=-w, constraints=LinearConstraint(A, -np.inf, 1),
               bounds=Bounds(0, 1), integrality=np.ones(n),
               options={"time_limit": float(time_limit)})
    if res.x is None:
        return np.zeros(n, np.int8), 0.0, "Timeout"
    sel = (res.x > 0.5).astype(np.int8)
    util = float(w[sel == 1].sum())
    status = "Optimal" if res.status == 0 else "Timeout"
    return sel, util, status

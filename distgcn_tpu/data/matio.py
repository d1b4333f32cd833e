""".mat dataset IO — the data contract of the reference `data/` directories.

Contract (Data_Generation.py:218-219, verified on data/*_GEN21_test2):
    adj            sparse CSC float (N, N)     conflict graph, 0/1 symmetric
    weights        (1, N) float                node weights
    N, p           scalars                     graph config
    mwis_label     (1, N) float 0/1            best-heuristic IS indicator
    mwis_utility   (1, 1) float                utility of that IS
    greedy_utility (1, 1) float                centralized-greedy utility

Filename schema ``{type}_n{N}_p{p}_b{i}_{dist}.mat`` parsed by
`test_utils.extract_N/extract_Np` (test_utils.py:51-60).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import scipy.io as sio
import scipy.sparse as sp


@dataclass
class GraphInstance:
    adj: sp.csr_matrix
    weights: np.ndarray            # (N,)
    name: str = ""
    mwis_label: Optional[np.ndarray] = None
    mwis_utility: Optional[float] = None
    greedy_utility: Optional[float] = None
    n: Optional[int] = None
    p: Optional[float] = None

    @property
    def num_nodes(self) -> int:
        return self.adj.shape[0]


def load_mat(path: str) -> GraphInstance:
    m = sio.loadmat(path)
    adj = m["adj"]
    if not sp.issparse(adj):
        adj = sp.csr_matrix(adj)
    inst = GraphInstance(
        adj=adj.tocsr(),
        weights=np.asarray(m["weights"]).flatten().astype(np.float64),
        name=os.path.basename(path),
    )
    if "mwis_label" in m:
        inst.mwis_label = np.asarray(m["mwis_label"]).flatten()
    for key, attr in (("mwis_utility", "mwis_utility"),
                      ("greedy_utility", "greedy_utility")):
        if key in m:
            setattr(inst, attr, float(np.asarray(m[key]).flatten()[0]))
    for key, attr in (("N", "n"), ("p", "p")):
        if key in m:
            setattr(inst, attr, np.asarray(m[key]).flatten()[0])
    return inst


def save_mat(path: str, adj, weights, **extra) -> None:
    payload = {"adj": sp.csc_matrix(adj).astype(float),
               "weights": np.asarray(weights, dtype=float).reshape(1, -1)}
    payload.update(extra)
    sio.savemat(path, payload)


def list_dataset(datapath: str) -> List[str]:
    """Sorted .mat files — matches reference driver iteration order
    (`mwis_gdpg_train.py:44`)."""
    return sorted(f for f in os.listdir(datapath) if f.endswith(".mat"))


def extract_n(filename: str) -> int:
    """test_utils.py:57-60."""
    return int(filename[:-4].split("_")[1][1:])


def extract_np(filename: str) -> float:
    """test_utils.py:51-54."""
    parts = filename[:-4].split("_")
    return round(float(parts[2][1:]) * float(parts[1][1:]), 0)

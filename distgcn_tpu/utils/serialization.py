"""Flat .npz parameter serialization (native checkpoint format).

Replaces TF1 Saver checkpoints (mwis_gdpg_call.py:109-118) with a plain
flattened-key npz; orbax is available for larger models but is overkill for
these kB-scale GCNs.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

SEP = "::"


def save_params(path: str, params) -> None:
    flat = {}

    def walk(tree, prefix):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, (prefix + SEP + k) if prefix else k)
        else:
            flat[prefix] = np.asarray(tree)

    walk(params, "")
    np.savez(path, **flat)


def load_params(path: str) -> Dict:
    data = np.load(path)
    tree: Dict = {}
    for key in data.files:
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree

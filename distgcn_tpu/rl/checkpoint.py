"""Training-state checkpointing.

The reference saves only model variables via TF1 Saver
(mwis_gdpg_call.py:109-118) — resuming training loses Adam moments and the
epsilon schedule. Here the full training state round-trips:
params + optimizer state + epsilon + best test ratio + step counters.

Uses orbax-checkpoint when available (large models / async), with a plain
npz+json fallback that covers the kB-scale GCNs.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax

from distgcn_tpu.utils.serialization import load_params, save_params


def save_training_state(path: str, agent, best_ratio: float = 0.0,
                        step: int = 0) -> None:
    os.makedirs(path, exist_ok=True)
    save_params(os.path.join(path, "params.npz"), agent.params)
    if getattr(agent, "target_params", None) is not None:
        save_params(os.path.join(path, "target_params.npz"),
                    agent.target_params)
    trainer = getattr(agent, "trainer", None)
    if trainer is not None:
        flat, treedef = jax.tree_util.tree_flatten(trainer.opt_state)
        np.savez(os.path.join(path, "opt_state.npz"),
                 *[np.asarray(x) for x in flat])
    meta = {"epsilon": float(agent.epsilon), "best_ratio": float(best_ratio),
            "step": int(step),
            "update_cnt": int(getattr(agent, "update_cnt", 0))}
    with open(os.path.join(path, "train_meta.json"), "w") as f:
        json.dump(meta, f)


def load_training_state(path: str, agent) -> Optional[dict]:
    """Restores in place; returns the meta dict or None if absent."""
    pfile = os.path.join(path, "params.npz")
    if not os.path.isfile(pfile):
        return None
    agent.params = load_params(pfile)
    tfile = os.path.join(path, "target_params.npz")
    if os.path.isfile(tfile) and hasattr(agent, "target_params"):
        agent.target_params = load_params(tfile)
    ofile = os.path.join(path, "opt_state.npz")
    trainer = getattr(agent, "trainer", None)
    if trainer is not None and os.path.isfile(ofile):
        data = np.load(ofile)
        flat = [data[k] for k in data.files]
        leaves, treedef = jax.tree_util.tree_flatten(trainer.opt_state)
        if len(flat) == len(leaves):
            trainer.opt_state = jax.tree_util.tree_unflatten(
                treedef, [jax.numpy.asarray(x) for x in flat])
        else:
            # optimizer-structure change across versions (e.g. the r5
            # optax.adam -> tf1_adam swap adds/removes a schedule-state
            # leaf under learning_decay < 1): resume with params but a
            # fresh optimizer state instead of crashing on unflatten
            import warnings
            warnings.warn(
                f"opt_state.npz has {len(flat)} leaves but the current "
                f"optimizer expects {len(leaves)} — optimizer state NOT "
                "restored (params/epsilon are); Adam moments restart")
    mfile = os.path.join(path, "train_meta.json")
    meta = None
    if os.path.isfile(mfile):
        with open(mfile) as f:
            meta = json.load(f)
        agent.epsilon = meta.get("epsilon", agent.epsilon)
        if hasattr(agent, "update_cnt"):
            agent.update_cnt = meta.get("update_cnt", 0)
    return meta or {}

"""distgcn_tpu — TPU-native framework for GNN-assisted distributed MWIS link scheduling.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zhongyuanzhao/distgcn ("Link Scheduling Using Graph Neural Networks",
IEEE TWC 2023): Chebyshev-style GCNs that reweight per-link utilities,
greedy / local-greedy / rollout MWIS solvers, RL training (GDPG & DQN),
wireless network scheduling simulation, and multi-chip scale-out over
a `jax.sharding.Mesh`.

Package layout
--------------
core/      Graph containers (dense padded batches, CSR), graph preprocessing
ops/       Pallas kernels + vectorized device ops (SpMM, local-greedy rounds)
models/    Flax GCN models (ChebGCN-DQN families, MLP baselines)
solvers/   MWIS solvers: host parity versions, device-vectorized versions,
           exact branch-and-bound (native C++)
rl/        Replay memory and jitted GDPG/DQN training steps
agents     The MWISSolver/DQNAgent API surface (mirrors mwis_gdpg_call.py)
parallel/  Mesh construction, sharded batch inference/training, halo SpMM
data/      Dataset generation + .mat IO (contract of reference data/)
sim/       Wireless scheduling simulators (single/multi-channel)
compat/    TF1 checkpoint importer for the reference model zoo
utils/     Config system, directory naming, resumable CSV results
cli/       Command-line drivers replacing the reference bash/ scripts
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DISTGCN_PLATFORM"):
    # A site hook pre-imports jax, so JAX_PLATFORMS in the environment is
    # read too late; route platform selection through jax.config instead.
    # Used by CLI sweeps whose models are tiny enough that tunnel RTT to
    # the TPU dominates compute (e.g. per-slot 1-layer GCN calls).
    import jax as _jax

    try:
        _initialized = bool(_jax._src.xla_bridge._backends)
    except Exception:
        _initialized = False
    if _initialized:
        import warnings as _warnings

        _warnings.warn(
            "DISTGCN_PLATFORM is set but a jax backend is already "
            "initialized — import distgcn_tpu before touching jax "
            "(e.g. before jax.devices()) for the hook to take effect.")
    else:
        _jax.config.update("jax_platforms",
                           _os.environ["DISTGCN_PLATFORM"])

from distgcn_tpu.utils.config import Config  # noqa: F401

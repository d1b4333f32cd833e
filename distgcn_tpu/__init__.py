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

from distgcn_tpu.utils.config import Config  # noqa: F401

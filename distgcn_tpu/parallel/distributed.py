"""Multi-process / multi-host runtime: `jax.distributed` wiring.

The reference is strictly single-process (one tf.Session; SURVEY §2.5) — its
"distributed" is the wireless protocol cost model. Scale-out here is real:
each process owns its local devices (TPU hosts of a pod slice, or CPU
processes in tests), `jax.distributed.initialize` joins them into one global
runtime, and the sharded programs in `parallel/mesh.py` / `parallel/halo.py`
run unchanged over the **global** device set — GSPMD partitions by named
sharding, collectives ride ICI within a host/slice and DCN (gRPC/Gloo on
CPU) across processes.

Environment contract (set by the launcher, e.g. scripts/run_multiprocess.sh
or a pod scheduler):

    DISTGCN_COORDINATOR   host:port of process 0 (required for CPU/GPU
                          clusters; TPU pods auto-detect when unset)
    DISTGCN_NUM_PROCESSES total process count
    DISTGCN_PROCESS_ID    this process's rank

Data convention for host-loaded inputs: every process loads the SAME host
data (datasets are small .mat files; loading is cheaper than scattering) and
`host_to_global` builds the global sharded Array by slicing locally — no
host-0 broadcast needed, and it works identically in single-process runs.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the global runtime. Args default from the DISTGCN_* env vars;
    with nothing set and a single process, this is a no-op (returns False).

    On TPU pods, call with no args/env: jax.distributed.initialize
    auto-detects the coordinator from the TPU metadata.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "DISTGCN_COORDINATOR")
    if num_processes is None and "DISTGCN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["DISTGCN_NUM_PROCESSES"])
    if process_id is None and "DISTGCN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["DISTGCN_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        if os.environ.get("DISTGCN_DISTRIBUTED", "0") == "1":
            jax.distributed.initialize()   # TPU pod auto-detect
            return True
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def global_mesh(axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over ALL global devices (every process's). Default: 1-D."""
    devs = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(tuple(shape)), tuple(axis_names))


def host_to_global(mesh: Mesh, spec: P, host_array) -> jax.Array:
    """Build a global sharded Array from host data REPLICATED on every
    process: each addressable device materializes only its slice."""
    host_array = np.asarray(host_array)

    def cb(index):
        return host_array[index]

    return jax.make_array_from_callback(host_array.shape,
                                        NamedSharding(mesh, spec), cb)


def gather_global(arr) -> np.ndarray:
    """Gather a (possibly non-fully-addressable) global Array onto every
    process as a numpy array."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def process_info() -> tuple:
    """(process_id, num_processes, local_devices, global_devices)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count())

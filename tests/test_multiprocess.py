"""Multi-process distributed runtime test (SURVEY §2.5 comm-backend row,
§4 lines 339-340): two OS processes x 4 virtual CPU devices join one
8-device global runtime via `jax.distributed` (Gloo collectives) and run
the sharded solve / train / giant-graph LGS paths, asserting equality with
single-process results inside the workers (tests/mp_worker.py)."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_paths():
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(2):
        env = dict(env_base,
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   DISTGCN_COORDINATOR=f"localhost:{port}",
                   DISTGCN_NUM_PROCESSES="2",
                   DISTGCN_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[{pid}] WORKER_OK" in out, out

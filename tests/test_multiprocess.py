"""Multi-process distributed runtime test (SURVEY §2.5 comm-backend row,
§4 lines 339-340): N OS processes x 8/N virtual CPU devices join one
8-device global runtime via `jax.distributed` (Gloo collectives) and run
the sharded solve / train / giant-graph LGS paths, asserting equality with
single-process results inside the workers (tests/mp_worker.py). The
2-process point runs the workers directly; the 4-process point goes
through the shipped launcher (scripts/run_multiprocess.sh) so the
DISTGCN_* env contract stays executable."""

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
@pytest.mark.parametrize("nproc", [2])
def test_n_process_sharded_paths(nproc):
    port = _free_port()
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = []
    for pid in range(nproc):
        env = dict(env_base,
                   XLA_FLAGS="--xla_force_host_platform_device_count="
                             f"{8 // nproc}",
                   DISTGCN_COORDINATOR=f"localhost:{port}",
                   DISTGCN_NUM_PROCESSES=str(nproc),
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


@pytest.mark.slow
def test_launcher_four_process():
    """scripts/run_multiprocess.sh sets the documented DISTGCN_* contract
    (parallel/distributed.py:12-19); 4 procs x 2 devices = same global 8."""
    launcher = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "run_multiprocess.sh")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        ["bash", launcher, "-n", "4", "-d", "2", _WORKER],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=420)
    assert out.returncode == 0, out.stdout
    for pid in range(4):
        assert f"[{pid}] WORKER_OK" in out.stdout, out.stdout

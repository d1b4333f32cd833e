#!/usr/bin/env bash
# Multi-process launcher for the DISTGCN_* environment contract
# (distgcn_tpu/parallel/distributed.py:12-19). Spawns N local processes of
# one Python entrypoint, gives each its rank, points them all at rank 0's
# coordinator port, and propagates the first failure.
#
#   scripts/run_multiprocess.sh [-n NPROC] [-d DEVICES_PER_PROC] [-p PORT] \
#       entrypoint.py [args...]
#
# Defaults: -n 2 processes, -d 4 virtual CPU devices per process (the
# 2x4=8-device CPU cluster the test suite uses), ephemeral port.
#
#   scripts/run_multiprocess.sh tests/mp_worker.py
#   scripts/run_multiprocess.sh -n 4 -d 2 tests/mp_worker.py
#
# Entry points force the CPU backend themselves (jax.config.update —
# JAX_PLATFORMS is too late under the site hook; see CLAUDE.md). On a real
# multi-host TPU pod this script is NOT the path: run one process per host
# with DISTGCN_DISTRIBUTED=1 and jax.distributed auto-detects the
# coordinator from the TPU metadata (distributed.initialize).
set -u

NPROC=2
DEVICES=4
PORT=""
while getopts "n:d:p:" opt; do
  case $opt in
    n) NPROC=$OPTARG ;;
    d) DEVICES=$OPTARG ;;
    p) PORT=$OPTARG ;;
    *) echo "usage: $0 [-n nproc] [-d devices_per_proc] [-p port] entry.py [args...]" >&2
       exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ $# -ge 1 ] || { echo "missing entrypoint" >&2; exit 2; }

if [ -z "$PORT" ]; then
  PORT=$(python - <<'EOF'
import socket
s = socket.socket()
s.bind(("", 0))
print(s.getsockname()[1])
s.close()
EOF
)
fi

PIDS=()
for ((i = 0; i < NPROC; i++)); do
  DISTGCN_COORDINATOR="localhost:${PORT}" \
  DISTGCN_NUM_PROCESSES="${NPROC}" \
  DISTGCN_PROCESS_ID="${i}" \
  XLA_FLAGS="--xla_force_host_platform_device_count=${DEVICES}" \
  python "$@" &
  PIDS+=($!)
done

STATUS=0
for pid in "${PIDS[@]}"; do
  if ! wait "$pid"; then
    STATUS=1
    # a dead rank wedges the rest at the next collective — stop them by PID
    for q in "${PIDS[@]}"; do
      kill "$q" 2>/dev/null || true
    done
  fi
done
exit $STATUS

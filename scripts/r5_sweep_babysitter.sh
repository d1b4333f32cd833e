#!/bin/bash
# Round-5 ER exact-sweep babysitter: keeps one shard worker alive until the
# stated wall-clock end, restarting it (resume is row-level via the shard
# CSV) whenever it exits or its per-launch wrapper expires.
# Usage: r5_sweep_babysitter.sh <shard-index> <end-epoch-seconds> [timeout]
SHARD=$1
END=$2
ITIMEOUT=${3:-2500}
LOG=/root/repo/output/logs/r5_sweep_worker${SHARD}.log
while true; do
  NOW=$(date +%s)
  LEFT=$((END - NOW))
  if [ "$LEFT" -lt 600 ]; then
    echo "[babysitter] $(date -u +%H:%M:%S) done (left=${LEFT}s)" >> "$LOG"
    break
  fi
  echo "[babysitter] $(date -u +%H:%M:%S) launching shard $SHARD (left=${LEFT}s)" >> "$LOG"
  PYTHONPATH=/root/repo:/root/.axon_site DISTGCN_PLATFORM=cpu \
    timeout "$LEFT" python -m distgcn_tpu.cli.benchmark_solver \
    --datapath=/root/reference/data/ER_Graph_Uniform_GEN21_test2 \
    --solver=auto --timeout="$ITIMEOUT" --shard="$SHARD/2" >> "$LOG" 2>&1
  sleep 10
done

#!/bin/bash
# Collapse root-cause legs (VERDICT r5 #1). Sequential, one process per leg,
# NO timeouts (CLAUDE.md env rule 2). Run detached:
#   nohup bash tools/run_diag_collapse.sh > /tmp/diag_collapse_driver.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

for run in 2 4; do
  for variant in baseline headfp32; do
    echo "== ours run=$run variant=$variant"
    python tools/diag_collapse.py --run $run --variant $variant \
      || echo "LEG FAILED rc=$? run=$run variant=$variant"
  done
done
echo "ALL DIAG LEGS DONE"

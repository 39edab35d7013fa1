#!/bin/bash
# Round-4 long-context variant coverage (VERDICT r03 item 8): the flash
# blocks were tuned at B16's 768-hidden/12-head shape; L16 is 1024/16h
# (same head_dim 64). Measure L16 at 500p TRAIN and at 5000p infer/train.
# Each leg is its own process (a leg OOM cannot take out the others).
# NO timeout wrappers: these legs touch the TPU and killing a TPU-touching
# process wedges the chip server-side for ~30-60 min (CLAUDE.md env rule 2).
# If a leg hangs, poll this log and wait out the relay TTL instead.
# Run detached on a quiet chip:
#   nohup bash tools/run_l16_coverage.sh > /tmp/l16_coverage.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
P=tools/profiler.py

echo "== L16 500p train b16"
python $P train --variant L16 --patches 500 --batch 16 --iters 30 || echo "LEG FAILED rc=$?"

echo "== L16 5000p inference (stages) b8"
python $P stages --variant L16 --patches 5000 --batch 8 --iters 10 || echo "LEG FAILED rc=$?"

echo "== L16 5000p train b4"
python $P train --variant L16 --patches 5000 --batch 4 --iters 10 || echo "LEG FAILED rc=$?"

echo "== L16 5000p train b8 (HBM probe; may OOM -- that is a result)"
python $P train --variant L16 --patches 5000 --batch 8 --iters 10 || echo "LEG FAILED rc=$?"

echo "== B16 500p train b16 (same-session contention control)"
python $P train --variant B16 --patches 500 --batch 16 --iters 30 || echo "LEG FAILED rc=$?"
echo "ALL LEGS DONE"

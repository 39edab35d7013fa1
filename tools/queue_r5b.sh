#!/bin/bash
# Round-5 tail hardware queue (sequential — the chip and the 1-core host
# must not be shared by timing-sensitive legs):
#   1. serving loadtest r5 (uint8 ingest + transfer probe + int8 level)
#   2. attention-shape MXU roofline probe (adjudicate train_5000p MFU)
#   3. parity config 4 full: fixed-gate fp32 paired torch sweep,
#      deadline-bounded so the chip is idle before the driver's bench.
# Never edit this file while a bash is executing it (CLAUDE.md round-5).
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:$PYTHONPATH
L=/root/repo/.queue_r5_logs
mkdir -p "$L"

echo "=== leg 1: serving loadtest r5 (uint8 ingest) $(date -u)"
python tools/serving_loadtest.py > "$L/loadtest.log" 2>&1
echo "leg1 rc=$? $(date -u)"

echo "=== leg 2: attention roofline probe $(date -u)"
python tools/probe_attn_roofline.py > "$L/roofline.log" 2>&1
echo "leg2 rc=$? $(date -u)"

echo "=== leg 3: parity config 4 (fixed gates, fp32 arms) $(date -u)"
cp PARITY_REPORT.json PARITY_REPORT.json.partial
python parity_run.py --configs 4 --full --resume-partial --reuse-sweep \
  --sweep-runs 10 --sweep-deadline-ts 1787185800 \
  --out PARITY_REPORT.json > "$L/parity_c4.log" 2>&1
echo "leg3 rc=$? $(date -u)"

echo "QUEUE DONE $(date -u)"

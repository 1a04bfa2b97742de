#!/bin/bash
# Round-4 chip queue, part 4: waits for chain 3, then
#   1. dilated-vs-subpixel transposed-conv A/B on the serving graph
#      (examples/subpixel_probe.py) — decides whether bench.py's
#      headline modes switch to algorithm="subpixel"
#   2. final detector error analysis: latest anchor-v3 step with the
#      swept decode defaults (radius 15, candidates 128) — the number
#      VERDICT item 1 is judged on
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain3.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain3 finished"

mkdir -p artifacts runs
timeout 2400 python examples/subpixel_probe.py \
    > artifacts/subpixel_probe_r4.json 2> runs/subpixel_probe.err
echo "subpixel probe rc=$?"

timeout 1800 python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor3/ckpt \
    > artifacts/detector_error_analysis_final_r4.json \
    2> runs/detector_final.err
echo "final detector analysis rc=$?"
echo "chain4 done"

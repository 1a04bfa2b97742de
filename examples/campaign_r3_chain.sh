#!/bin/bash
# Round-3 regen chain: wait for the in-flight pretrain (PID in
# /tmp/pretrain.pid) to finish, then run a bench preflight (the
# BENCH_r03 driver gate), then the stage-2 GAN retrain and the stage-3
# eval matrix — back-to-back so the single chip never idles.
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/pretrain.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "pretrain finished"

timeout 560 python bench.py > runs/bench_preflight_r3.out 2> runs/bench_preflight_r3.err
echo "bench preflight rc=$?"

bash examples/campaign_r3_rerun_stage2.sh > runs/stage2_rerun.log 2>&1
echo "stage2 rc=$?"

bash examples/campaign_r3_rerun_stage3.sh > runs/stage3_rerun.log 2>&1
echo "stage3 rc=$?"
echo "chain done"

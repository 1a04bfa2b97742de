#!/bin/bash
# Round-3 chip queue, part 2: waits for the stage-10 regen chain
# (campaign_r3_chain.sh, PID in /tmp/chain.pid) and then runs the
# remaining on-chip experiments back to back:
#   1. 1024-bucket pretrain smoke (round-2 verdict item 9)
#   2. grad-accumulation A/B (new train.grad_accum_steps feature)
#   3. batch-512 synthesis probe (does throughput rise past b=256?)
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain1 finished"

bash examples/pretrain_1024_smoke.sh > runs/pretrain1024_smoke.log 2>&1
echo "1024 smoke rc=$?"

bash examples/grad_accum_ab.sh > runs/grad_accum_ab.log 2>&1
echo "accum ab rc=$?"

timeout 1200 python examples/batch512_probe.py > runs/batch512_probe.out 2> runs/batch512_probe.err
echo "b512 probe rc=$?"
echo "chain2 done"

#!/bin/bash
# Round-4 chip queue, part 7: waits for chain 6, then re-runs the
# grad-accum quality A/B (VERDICT r3 item 9) under the compile-fair
# design: the first attempt's b512 arm burned its whole 1500 s budget
# in cold compile (zero steps — runs/accum_q_ab.log). With the
# persistent XLA cache now enabled in cli.py, both arms warm their
# compiles first, then each gets a fresh equal stepping budget.
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain6.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain6 finished"

bash examples/grad_accum_quality_ab.sh
echo "chain7 done"

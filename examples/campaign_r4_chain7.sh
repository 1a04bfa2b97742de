#!/bin/bash
# Round-4 chip queue, part 7: waits for chain 6, then
#   1. detector error analysis with mirror TTA and with the serving
#      letterbox control — the within_5px-vs-0.5 bar (VERDICT item 1)
#      is judged on the best deployable decode, which is soft decode +
#      TTA; these regenerate the two artifacts the earlier failed probe
#      left empty
#   2. the grad-accum quality A/B (VERDICT item 9) under the
#      compile-fair design: the first attempt's b512 arm burned its
#      whole 1500 s budget in cold compile (zero steps —
#      runs/accum_q_ab.log). With the persistent XLA cache now enabled
#      in cli.py, both arms warm their compiles first, then each gets a
#      fresh equal stepping budget.
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain6.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain6 finished"

mkdir -p artifacts runs
timeout 2400 python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor3/ckpt --tta \
    > artifacts/detector_error_tta_r4.json 2> runs/detector_tta.err
echo "tta analysis rc=$?"
timeout 2400 python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor3/ckpt --serving \
    > artifacts/detector_error_serving_r4.json 2> runs/detector_serving.err
echo "serving-control analysis rc=$?"

bash examples/grad_accum_quality_ab.sh
echo "chain7 done"

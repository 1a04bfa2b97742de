#!/bin/bash
# Round-4 chip queue, part 6: waits for chain 5, then
#   1. full-stack serving throughput — raw-bytes -> frontal-face as one
#      dispatch, bf16 vs int8-G (sits next to the synthesis-only bench
#      headline; quantifies the deployment path's detector+preprocess
#      cost)
#   2. int8 quality at the bf16 rescale epilogue — the probed-fastest
#      int8 variant (1328 imgs/s, artifacts/int8_variants_probe_r4.json)
#      needs its own quality cert before bench.py's int8 mode can adopt
#      it
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain5.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain5 finished"

mkdir -p artifacts runs
timeout 2400 python examples/fullstack_serving_probe.py \
    > artifacts/fullstack_serving_probe_r4.json \
    2> runs/fullstack_probe.err
echo "fullstack probe rc=$?"

timeout 1800 python examples/int8_quality.py --checkpoint runs/gan_rc/ckpt \
    --img-list data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --rescale-dtype bfloat16 \
    > artifacts/int8_quality_bf16rescale_r4.json \
    2> runs/int8_quality_bf16.err
echo "int8 bf16-rescale quality rc=$?"
echo "chain6 done"

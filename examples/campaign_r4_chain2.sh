#!/bin/bash
# Round-4 chip queue, part 2: waits for chain 1 (anchor detector + GAN
# 10k retrain, PID in /tmp/chain1.pid), then runs the evidence matrix:
#   1. full-stack held-out evals — GT landmarks (ceiling) vs baseline
#      detector vs ANCHOR detector (VERDICT item 1's "done" metric)
#   2. EMA A/B (item 2)
#   3. int8 variants probe + quality re-cert on the fresh generator
#      (item 3)
#   4. harder identity protocol, 300 subjects x 13 cameras (item 5)
#   5. grad-accum quality A/B (item 9)
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain1.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain1 finished"

mkdir -p artifacts
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt --checkpoint runs/gan_rc/ckpt"
timeout 2400 $EV > artifacts/eval_heldout_gt_r4.json
timeout 2400 $EV --detector-checkpoint runs/pretrain_v2/ckpt/best \
    > artifacts/eval_heldout_fullstack_base_r4.json
# latest step (2960), not best/: the decode sweep showed the hard-
# decode-selected "best" (2800) underperforms the tail checkpoints
# under the tuned soft decode (artifacts/decode_sweep_r4.json)
timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
    > artifacts/eval_heldout_fullstack_r4.json
echo "fullstack evals rc=$?"

bash examples/ema_ab_regen.sh > runs/ema_ab_r4.log 2>&1
echo "ema ab rc=$?"

timeout 3000 python examples/int8_variants_probe.py \
    > artifacts/int8_variants_probe_r4.json 2> runs/int8_probe.err
echo "int8 probe rc=$?"

timeout 1800 python examples/int8_quality.py --checkpoint runs/gan_rc/ckpt \
    --img-list data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    > artifacts/int8_quality_r4.json 2> runs/int8_quality.err
echo "int8 quality rc=$?"

bash examples/hard_identity_protocol.sh > runs/hard_protocol.log 2>&1
echo "hard protocol rc=$?"

bash examples/grad_accum_quality_ab.sh > runs/accum_q_ab.log 2>&1
echo "accum ab rc=$?"
echo "chain2 done"

#!/bin/bash
# Round-4 chip queue, part 5: re-run the full-stack eval matrix under
# the FIXED serving geometry (letterbox upscale — the round-4 root
# cause: artifacts/serving_scale_probe_r4.json measured 87px mean
# detector error on the 128px eval probes at native scale vs 3.6px
# upscaled, 3.1px with mirror TTA). The chain2 full-stack artifacts
# (eval_heldout_fullstack{,_base}_r4.json) keep the broken-geometry
# "before" evidence; these are the "after":
#   1. anchor-v3 detector, upscale (the new default)
#   2. anchor-v3 detector, upscale + mirror TTA
#   3. BASELINE detector, upscale — does detector quality matter now
#      that geometry no longer drowns it?
#   4. EMA A/B live arm regenerated through --g-weights live (the
#      ema_decay-default flip had made the plain eval score EMA twice)
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain4.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain4 finished"

mkdir -p artifacts
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt --checkpoint runs/gan_rc/ckpt"

timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
    > artifacts/eval_heldout_fullstack_upscale_r4.json
echo "fullstack upscale rc=$?"

timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
    --detector-tta \
    > artifacts/eval_heldout_fullstack_tta_r4.json
echo "fullstack tta rc=$?"

timeout 2400 $EV --detector-checkpoint runs/pretrain_v2/ckpt/best \
    > artifacts/eval_heldout_fullstack_base_upscale_r4.json
echo "fullstack base upscale rc=$?"

EV1="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt"
timeout 1800 $EV1 --g-weights live --checkpoint runs/ema_ab/ema/ckpt \
    > artifacts/eval_ema_ab_ema_live_r4.json
echo "ema live regen rc=$?"
echo "chain5 done"

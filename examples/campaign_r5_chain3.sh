#!/bin/bash
# Round-5 chip queue, part 3: stall-recovery tail. A ~65-minute tunnel
# executor stall froze the chain2 gan_wide trainer at step 2780 (its
# in-flight RPC never completed after the executor came back; fresh
# clients worked) — the trainer was killed and this chain resumes from
# the last Orbax checkpoint and runs the evidence tail.
#
# Honesty rule upgrade (ADVICE r4): artifact suffixes are derived from
# the step count of the checkpoint the evals actually CONSUME, not from
# the requested budget — if the wall clock forces cutting training at a
# checkpoint boundary, every eval name self-documents the partial
# generator (*_partialNNNN); canonical *_r5 names appear ONLY when the
# full 10k recipe finished.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs artifacts

has_ckpt () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }
ok_json () { python -c "import json,sys; json.load(open(sys.argv[1]))" "$1" 2>/dev/null; }

WIDE_STEPS="${WIDE_STEPS:-10000}"

# ---- stage A: resume gan_wide ----
time python -m tpgan_tpu.cli train --packed data_synth/gan_wide/packed \
    --steps "$WIDE_STEPS" --identity-checkpoint runs/embedder_wide/ckpt \
    --checkpoint runs/gan_wide/ckpt --sample-dir runs/gan_wide/samples \
    --log-dir runs/gan_wide/logs --sample-every 2000 --device-data \
    $(has_ckpt runs/gan_wide/ckpt && echo --resume) \
    --set train.batch_size=128 \
    --set train.remat=true --set train.checkpoint_every_steps=1000 \
    --set G.upsample_mode=resize_conv \
    --set loss.weight_identity_preserving=0.3 \
    --set train.yaw_weight_gamma=3.0 \
    >> runs/gan_wide.log 2>&1
echo "gan_wide rc=$?"

LAST=$(ls runs/gan_wide/ckpt 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
SUF=""; [ "$LAST" != 10000 ] && SUF="_partial$LAST"
echo "evals score checkpoint step $LAST (suffix '$SUF')"

# ---- stage B: fixed-geometry full-stack matrix (VERDICT item 1) ----
# three arms, priority order: GT landmarks (the bar), detected with the
# certified serving config (upscale + TTA + refine + prior vote,
# detector_error_tta_refine_gated_r5.json: nose tail 0.025), detected
# with the plain upscale geometry (the r4-comparable control)
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt --checkpoint runs/gan_wide/ckpt"

ok_json "artifacts/eval_heldout_gt_r5$SUF.json" || \
  timeout 2400 $EV > "artifacts/eval_heldout_gt_r5$SUF.json" \
      2> runs/eval_gt_r5.err
echo "gt rc=$?"
ok_json "artifacts/eval_heldout_fullstack_ttarefine_r5$SUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      --detector-tta --detector-refine \
      > "artifacts/eval_heldout_fullstack_ttarefine_r5$SUF.json" \
      2> runs/eval_fullstack_ttarefine_r5.err
echo "fullstack tta+refine rc=$?"
ok_json "artifacts/eval_heldout_fullstack_upscale_r5$SUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      > "artifacts/eval_heldout_fullstack_upscale_r5$SUF.json" \
      2> runs/eval_fullstack_upscale_r5.err
echo "fullstack upscale rc=$?"
echo "stage B (full-stack matrix) done"

# ---- stage C: hard protocol (VERDICT item 5) + continuity row ----
EVW="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt \
    --checkpoint runs/gan_wide/ckpt"
ok_json "artifacts/eval_protocol300_hard_r5$SUF.json" || \
  timeout 5400 $EVW --img-list data_synth/eval_hard/img.list \
      --set train.img_list=data_synth/eval_hard/img.list \
      > "artifacts/eval_protocol300_hard_r5$SUF.json" \
      2> runs/protocol300_r5.err
echo "hard protocol rc=$?"
ok_json "artifacts/eval_protocol40_r5$SUF.json" || \
  timeout 1800 $EVW --img-list data_synth/eval/img.list \
      --set train.img_list=data_synth/eval/img.list \
      > "artifacts/eval_protocol40_r5$SUF.json" 2> runs/protocol40_r5.err
echo "protocol40 rc=$?"
echo "stage C (protocols) done"

# ---- stage D: int8 PTQ quality certs (full 10k budget only) ----
if [ -z "$SUF" ]; then
ok_json artifacts/int8_quality_r5.json || \
  timeout 1800 python examples/int8_quality.py --checkpoint runs/gan_wide/ckpt \
      --img-list data_synth/eval/img.list \
      --set G.upsample_mode=resize_conv \
      > artifacts/int8_quality_r5.json 2> runs/int8_quality_r5.err
echo "int8 f32-rescale cert rc=$?"
ok_json artifacts/int8_quality_bf16rescale_r5.json || \
  timeout 1800 python examples/int8_quality.py --checkpoint runs/gan_wide/ckpt \
      --img-list data_synth/eval/img.list \
      --set G.upsample_mode=resize_conv --rescale-dtype bfloat16 \
      > artifacts/int8_quality_bf16rescale_r5.json \
      2> runs/int8_quality_bf16_r5.err
echo "int8 bf16-rescale cert rc=$?"
fi
echo "stage D (int8 certs) done"

# ---- stage E: bench verification + compile-cache warm ----
ok_json artifacts/bench_verify_r5.json || \
  TPGAN_BENCH_BUDGET=480 timeout 700 python bench.py \
      > artifacts/bench_verify_r5.json 2> runs/bench_verify_r5.err || true
tail -1 artifacts/bench_verify_r5.json

# ---- stage F: grad-accum quality A/B (VERDICT item 4) ----
ACCUM_AB_BUDGET="${ACCUM_AB_BUDGET:-900}" \
  bash examples/grad_accum_quality_ab.sh > runs/accum_q_ab3.log 2>&1
echo "accum ab rc=$?"
echo "chain3 done"

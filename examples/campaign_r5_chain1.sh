#!/bin/bash
# Round-5 chip queue, part 1 — the serialized evidence chain. One chip,
# one job at a time: the round-4 accum A/B died with RESOURCE_EXHAUSTED
# because it ran CONCURRENTLY with chain9's gan_rc training (two
# processes on one TPU, runs/accum_q_ab2.log) — every stage here waits
# for the previous one.
#
#   A. gan_rc resume 3k -> 10k        (the round-4 recipe, unchanged)
#   B. fixed-geometry full-stack matrix  (VERDICT r4 item 1)
#   C. int8 PTQ quality certs            (f32 + bf16 rescale epilogues)
#   D. bench verification run            (VERDICT item 2: headline mode
#                                         must survive a budget squeeze)
#   E. grad-accum quality A/B            (VERDICT item 4, exclusive chip)
#   F. wide-ring corpus + embedder + gan_wide train (VERDICT item 5:
#      the ±90° identity floor is a CORPUS gap — training yaw tops out
#      at 60° while the hard protocol probes ±90°; fix = full 13-camera
#      ring + yaw-weighted sampling, train.yaw_weight_gamma)
#   G. hard-protocol eval of gan_wide    (same scoring embedder_v2 ->
#                                         comparable to the r4 artifact)
#
# ADVICE r4 rule: artifacts get canonical *_r5 names ONLY at the full
# step budget; trimmed runs write *_partial names so ok_json guards can
# never freeze partial-generator numbers as full-run evidence.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs artifacts

has_ckpt () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }
ok_json () { python -c "import json,sys; json.load(open(sys.argv[1]))" "$1" 2>/dev/null; }

GAN_STEPS="${GAN_STEPS:-10000}"
WIDE_STEPS="${WIDE_STEPS:-10000}"
SUF=""; [ "$GAN_STEPS" != 10000 ] && SUF="_partial"
WSUF=""; [ "$WIDE_STEPS" != 10000 ] && WSUF="_partial"

# ---- stage A: quality generator resume (~1.9h from step 3000) ----
mkdir -p runs/gan_rc
time python -m tpgan_tpu.cli train --packed data_synth/gan/packed \
    --steps "$GAN_STEPS" --identity-checkpoint runs/embedder/ckpt \
    --checkpoint runs/gan_rc/ckpt --sample-dir runs/gan_rc/samples \
    --log-dir runs/gan_rc/logs --sample-every 2000 --device-data \
    $(has_ckpt runs/gan_rc/ckpt && echo --resume) \
    --set train.batch_size=128 \
    --set train.remat=true --set train.checkpoint_every_steps=1000 \
    --set G.upsample_mode=resize_conv \
    --set loss.weight_identity_preserving=0.3 \
    >> runs/gan_rc.log 2>&1
echo "gan_rc rc=$?"

# ---- stage B: fixed-geometry full-stack matrix ----
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt --checkpoint runs/gan_rc/ckpt"

ok_json "artifacts/eval_heldout_gt_r5$SUF.json" || \
  timeout 2400 $EV > "artifacts/eval_heldout_gt_r5$SUF.json" \
      2> runs/eval_gt_r5.err
echo "gt rc=$?"

ok_json "artifacts/eval_heldout_fullstack_upscale_r5$SUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      > "artifacts/eval_heldout_fullstack_upscale_r5$SUF.json" \
      2> runs/eval_fullstack_upscale_r5.err
echo "fullstack upscale rc=$?"

ok_json "artifacts/eval_heldout_fullstack_tta_r5$SUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      --detector-tta \
      > "artifacts/eval_heldout_fullstack_tta_r5$SUF.json" \
      2> runs/eval_fullstack_tta_r5.err
echo "fullstack tta rc=$?"

# refine arm: second-stage zoom-crop re-detection (frontalize.refine_
# lm5) — the round-5 mechanism against the nose >45 px letterbox tail
ok_json "artifacts/eval_heldout_fullstack_refine_r5$SUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      --detector-refine \
      > "artifacts/eval_heldout_fullstack_refine_r5$SUF.json" \
      2> runs/eval_fullstack_refine_r5.err
echo "fullstack refine rc=$?"

# ---- stage C: int8 quality certs ----
ok_json "artifacts/int8_quality_r5$SUF.json" || \
  timeout 1800 python examples/int8_quality.py --checkpoint runs/gan_rc/ckpt \
      --img-list data_synth/eval/img.list \
      --set G.upsample_mode=resize_conv \
      > "artifacts/int8_quality_r5$SUF.json" 2> runs/int8_quality_r5.err
echo "int8 f32-rescale cert rc=$?"

ok_json "artifacts/int8_quality_bf16rescale_r5$SUF.json" || \
  timeout 1800 python examples/int8_quality.py --checkpoint runs/gan_rc/ckpt \
      --img-list data_synth/eval/img.list \
      --set G.upsample_mode=resize_conv --rescale-dtype bfloat16 \
      > "artifacts/int8_quality_bf16rescale_r5$SUF.json" \
      2> runs/int8_quality_bf16_r5.err
echo "int8 bf16-rescale cert rc=$?"

# ---- stage D: bench verification (mode-order fix, VERDICT item 2) ----
ok_json artifacts/bench_verify_r5.json || \
  TPGAN_BENCH_BUDGET=480 timeout 700 python bench.py \
      > artifacts/bench_verify_r5.json 2> runs/bench_verify_r5.err || true
tail -1 artifacts/bench_verify_r5.json

# ---- stage E: grad-accum quality A/B (exclusive chip now) ----
ACCUM_AB_BUDGET="${ACCUM_AB_BUDGET:-1500}" \
  bash examples/grad_accum_quality_ab.sh > runs/accum_q_ab3.log 2>&1
echo "accum ab rc=$?"

# ---- stage F: wide-ring corpus + embedder + gan_wide ----
if [ ! -f data_synth/gan_wide/packed/index.json ]; then
  rm -rf data_synth/gan_wide
  time python - <<'EOF'
from tpgan_tpu.data.multipie import TrainDataset
from tpgan_tpu.data.packing import pack_dataset
from tpgan_tpu.data.synthetic_faces import (
    ALL_CAMERA_YAWS, generate_gan_protocol,
)
lst = generate_gan_protocol(
    "data_synth/gan_wide", 347, cameras=list(ALL_CAMERA_YAWS),
)
print("wide items:", len(lst))
pack_dataset(TrainDataset(lst), "data_synth/gan_wide/packed")
EOF
fi
find data_synth/gan_wide/train -name '*.png' | sort \
    > data_synth/embedder_wide.list
wc -l data_synth/embedder_wide.list

if ! has_ckpt runs/embedder_wide/ckpt; then
  time python -m tpgan_tpu.cli train-embedder \
      --img-list data_synth/embedder_wide.list \
      --steps 2500 --batch-size 64 --checkpoint runs/embedder_wide/ckpt \
      --no-augment --val-subjects 0 --log-dir runs/embedder_wide/logs \
      > runs/embedder_wide.log 2>&1
fi
echo "embedder_wide rc=$?"

mkdir -p runs/gan_wide
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
    > runs/gan_wide.log 2>&1
echo "gan_wide rc=$?"

# ---- stage G: hard protocol on gan_wide (scored by the SAME
# embedder_v2 as the r4 artifact -> directly comparable) ----
EVW="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt \
    --checkpoint runs/gan_wide/ckpt"

ok_json "artifacts/eval_protocol300_hard_r5$WSUF.json" || \
  timeout 5400 $EVW --img-list data_synth/eval_hard/img.list \
      --set train.img_list=data_synth/eval_hard/img.list \
      > "artifacts/eval_protocol300_hard_r5$WSUF.json" \
      2> runs/protocol300_r5.err
echo "hard protocol rc=$?"

ok_json "artifacts/eval_protocol40_r5$WSUF.json" || \
  timeout 1800 $EVW --img-list data_synth/eval/img.list \
      --set train.img_list=data_synth/eval/img.list \
      > "artifacts/eval_protocol40_r5$WSUF.json" 2> runs/protocol40_r5.err
echo "protocol40 rc=$?"
echo "chain1 done"

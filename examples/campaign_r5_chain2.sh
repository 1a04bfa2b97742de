#!/bin/bash
# Round-5 chip queue, part 2: post-host-reset full regen. The reset
# before this session wiped runs/, data_synth/ and /tmp (compile cache);
# chain1's premise (resume gan_rc from step 3000) is void. Two 10k GAN
# runs (~2.7h each) no longer fit the session, so this chain trains ONE
# 10k generator — the WIDE-RING recipe (full 13-camera corpus incl.
# ±75/±90 + train.yaw_weight_gamma, VERDICT r4 item 5) — and scores it
# for BOTH open quality items:
#   * item 1 (fixed-geometry full-stack matrix): the done-bar is a
#     SAME-generator delta (detected-landmark arms vs the GT-landmark
#     arm), so it is meaningful on any generator; absolute numbers are
#     read against this chain's own GT arm, not round 4's gan_rc.
#   * item 5 (±90° identity bins): needs the wide corpus — the r4
#     training yaw topped out at 60° while the hard protocol probes
#     ±90°; scored with the SAME embedder_v2 recipe as the r4 artifact.
# Stage order = VERDICT priority, so a wall-clock cut trims the tail:
#   A data  B embedders  C detector  D detector-tail analyses (item 3)
#   E gan_wide 10k  F full-stack matrix (item 1)  G hard protocol
#   (item 5)  H int8 certs  I accum A/B (item 4)  J bench warm (item 2)
# ADVICE r4 rule: canonical *_r5 names ONLY at the full step budget;
# trimmed runs write *_partial so ok_json guards never freeze
# partial-generator numbers as full-run evidence.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs artifacts

has_ckpt () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }
ok_json () { python -c "import json,sys; json.load(open(sys.argv[1]))" "$1" 2>/dev/null; }

WIDE_STEPS="${WIDE_STEPS:-10000}"
WSUF=""; [ "$WIDE_STEPS" != 10000 ] && WSUF="_partial"

# ---- stage A: synthetic corpora + protocols ----
if [ ! -f data_synth/gan/packed/index.json ]; then
  rm -rf data_synth/gan data_synth/pretrain
  time python -m tpgan_tpu.cli synth-data --out data_synth --protocol both \
      --subjects 347 --pretrain-images 4000 --pack
fi
if [ ! -f data_synth/eval/img.list ]; then
  python - <<'EOF'
from tpgan_tpu.data.synthetic_faces import generate_gan_protocol
lst = generate_gan_protocol("data_synth/eval", 40, start_subject=400)
print("eval items:", len(lst))
EOF
fi
if [ ! -f data_synth/eval_hard/img.list ]; then
  python - <<'EOF'
from tpgan_tpu.data.synthetic_faces import (
    ALL_CAMERA_YAWS, generate_gan_protocol,
)
lst = generate_gan_protocol(
    "data_synth/eval_hard", 300, cameras=list(ALL_CAMERA_YAWS),
    start_subject=600,
)
print("hard-protocol items:", len(lst))
EOF
fi
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
find data_synth/gan/train -name '*.png' | sort > data_synth/embedder.list
find data_synth/gan_wide/train -name '*.png' | sort \
    > data_synth/embedder_wide.list
wc -l data_synth/embedder.list data_synth/embedder_wide.list
echo "stage A (data) done"

# ---- stage B: embedders ----
# embedder_wide: the GAN identity-loss instrument for the wide run
# (must know the wide corpus' subjects); embedder_v2: the validated
# SCORING instrument, same recipe/corpus as every r4 artifact so the
# hard-protocol rows are cross-round comparable; embedder (v1): the
# accum-A/B arms' training instrument (stage-6 recipe parity).
if ! has_ckpt runs/embedder_wide/ckpt; then
  time python -m tpgan_tpu.cli train-embedder \
      --img-list data_synth/embedder_wide.list \
      --steps 2500 --batch-size 64 --checkpoint runs/embedder_wide/ckpt \
      --no-augment --val-subjects 0 --log-dir runs/embedder_wide/logs \
      > runs/embedder_wide.log 2>&1
fi
if ! has_ckpt runs/embedder_v2/ckpt; then
  time python -m tpgan_tpu.cli train-embedder \
      --img-list data_synth/embedder.list \
      --steps 2500 --batch-size 64 --checkpoint runs/embedder_v2/ckpt \
      --log-dir runs/embedder_v2/logs > runs/embedder_v2.log 2>&1
fi
if ! has_ckpt runs/embedder/ckpt; then
  time python -m tpgan_tpu.cli train-embedder \
      --img-list data_synth/embedder.list \
      --steps 2500 --batch-size 64 --checkpoint runs/embedder/ckpt \
      --no-augment --val-subjects 0 --log-dir runs/embedder/logs \
      > runs/embedder.log 2>&1
fi
echo "stage B (embedders) done"

# ---- stage C: anchor-v3 detector ----
if ! has_ckpt runs/pretrain_anchor3/ckpt; then
  time python -m tpgan_tpu.cli pretrain --checkpoint runs/pretrain_anchor3/ckpt \
      --device-data \
      --set pretrain.data_root_dir=data_synth/pretrain \
      --set "pretrain.image_buckets=(256,320)" \
      --set pretrain.validation_data_ratio=0.02 \
      --set "pretrain.learning_rate_scheduler_milestone=(20,30)" \
      --set pretrain.log_root_dir=runs/pretrain_anchor3/logs \
      --set pretrain.head_mode=anchor_offset \
      --set pretrain.loss.distance_threshold_ratio=0.01 \
      --set pretrain.num_epochs=40 > runs/pretrain_anchor3.log 2>&1
fi
echo "stage C (detector) done"

# ---- stage D: detector-tail analyses (VERDICT item 3) ----
# serving = the control (letterbox-upscale geometry, tuned soft decode);
# serving+refine = the round-5 mechanism against the nose >45px tail;
# tta = continuity row vs detector_error_tta_r4.json. One table, one
# checkpoint, one decode — the r4 discrepancy (decode-sweep 0.06 vs
# serving 0.175 nose tails) came from mixing checkpoints/geometries.
ok_json artifacts/detector_error_serving_r5.json || \
  timeout 2400 python examples/detector_error_analysis.py \
      --checkpoint runs/pretrain_anchor3/ckpt --serving \
      > artifacts/detector_error_serving_r5.json 2> runs/det_serving_r5.err
echo "serving analysis rc=$?"
ok_json artifacts/detector_error_refine_r5.json || \
  timeout 2400 python examples/detector_error_analysis.py \
      --checkpoint runs/pretrain_anchor3/ckpt --serving --refine \
      > artifacts/detector_error_refine_r5.json 2> runs/det_refine_r5.err
echo "refine analysis rc=$?"
ok_json artifacts/detector_error_tta_r5.json || \
  timeout 2400 python examples/detector_error_analysis.py \
      --checkpoint runs/pretrain_anchor3/ckpt --tta \
      > artifacts/detector_error_tta_r5.json 2> runs/det_tta_r5.err
echo "tta analysis rc=$?"
echo "stage D (detector analyses) done"

# ---- stage E: gan_wide 10k (~2.7h) ----
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

# ---- stage F: fixed-geometry full-stack matrix (VERDICT item 1) ----
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt --checkpoint runs/gan_wide/ckpt"

ok_json "artifacts/eval_heldout_gt_r5$WSUF.json" || \
  timeout 2400 $EV > "artifacts/eval_heldout_gt_r5$WSUF.json" \
      2> runs/eval_gt_r5.err
echo "gt rc=$?"
ok_json "artifacts/eval_heldout_fullstack_upscale_r5$WSUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      > "artifacts/eval_heldout_fullstack_upscale_r5$WSUF.json" \
      2> runs/eval_fullstack_upscale_r5.err
echo "fullstack upscale rc=$?"
ok_json "artifacts/eval_heldout_fullstack_tta_r5$WSUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      --detector-tta \
      > "artifacts/eval_heldout_fullstack_tta_r5$WSUF.json" \
      2> runs/eval_fullstack_tta_r5.err
echo "fullstack tta rc=$?"
ok_json "artifacts/eval_heldout_fullstack_refine_r5$WSUF.json" || \
  timeout 2400 $EV --detector-checkpoint runs/pretrain_anchor3/ckpt \
      --detector-refine \
      > "artifacts/eval_heldout_fullstack_refine_r5$WSUF.json" \
      2> runs/eval_fullstack_refine_r5.err
echo "fullstack refine rc=$?"
echo "stage F (full-stack matrix) done"

# ---- stage G: hard protocol (VERDICT item 5) + continuity row ----
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
echo "stage G (protocols) done"

# ---- stage H: int8 PTQ quality certs (full budget only) ----
if [ -z "$WSUF" ]; then
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
echo "stage H (int8 certs) done"

# ---- stage I: grad-accum quality A/B (VERDICT item 4, exclusive chip) ----
ACCUM_AB_BUDGET="${ACCUM_AB_BUDGET:-900}" \
  bash examples/grad_accum_quality_ab.sh > runs/accum_q_ab3.log 2>&1
echo "accum ab rc=$?"

# ---- stage J: bench verification + compile-cache warm for the driver ----
ok_json artifacts/bench_verify_r5.json || \
  TPGAN_BENCH_BUDGET=480 timeout 700 python bench.py \
      > artifacts/bench_verify_r5.json 2> runs/bench_verify_r5.err || true
tail -1 artifacts/bench_verify_r5.json
echo "chain2 done"

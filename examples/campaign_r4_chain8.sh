#!/bin/bash
# Round-4 chip queue, part 8: post-host-reset regen. The reset between
# round-4 sessions wiped runs/, data_synth/ and the /tmp compile cache;
# chains 5-7 never ran and the subpixel probe artifact was lost before
# commit. This chain rebuilds the minimum state for the still-open
# evidence, ordered by VERDICT priority:
#   1. (prereq) synthetic corpora + held-out eval protocol
#   2. (prereq) identity embedders v1 (GAN-loss instrument) and v2
#      (validated eval instrument)
#   3. grad-accum quality A/B — VERDICT r3 item 9, the only item with
#      no data yet (compile-fair design, examples/grad_accum_quality_ab.sh)
#   4. anchor-v3 detector retrain + the TTA / serving-control error
#      analyses (the within_5px-vs-0.5 bar for item 1's best deployable
#      decode) — only if wall clock remains
# Idempotence guards test the artifact each stage CONSUMES (a packed
# shard, a completed Orbax step dir), not a first-written side file.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs artifacts

PID=$(cat /tmp/probe.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "subpixel probe finished"

has_step () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }

# ---- stage A: data ----
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
find data_synth/gan/train -name '*.png' | sort > data_synth/embedder.list
wc -l data_synth/embedder.list
echo "stage A (data) done"

# ---- stage B: embedders ----
if ! has_step runs/embedder/ckpt; then
  time python -m tpgan_tpu.cli train-embedder --img-list data_synth/embedder.list \
      --steps 2500 --batch-size 64 --checkpoint runs/embedder/ckpt \
      --no-augment --val-subjects 0 --log-dir runs/embedder/logs \
      > runs/embedder.log 2>&1
fi
if ! has_step runs/embedder_v2/ckpt; then
  time python -m tpgan_tpu.cli train-embedder --img-list data_synth/embedder.list \
      --steps 2500 --batch-size 64 --checkpoint runs/embedder_v2/ckpt \
      --log-dir runs/embedder_v2/logs > runs/embedder_v2.log 2>&1
fi
echo "stage B (embedders) done"

# ---- stage C: grad-accum quality A/B (VERDICT item 9) ----
ACCUM_AB_BUDGET="${ACCUM_AB_BUDGET:-900}" \
  bash examples/grad_accum_quality_ab.sh > runs/accum_q_ab2.log 2>&1
echo "accum ab rc=$?"

# ---- stage D: anchor-v3 detector + TTA/serving analyses (item 1 tail) ----
if ! has_step runs/pretrain_anchor3/ckpt; then
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
timeout 2400 python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor3/ckpt --tta \
    > artifacts/detector_error_tta_r4.json 2> runs/detector_tta.err
echo "tta analysis rc=$?"
timeout 2400 python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor3/ckpt --serving \
    > artifacts/detector_error_serving_r4.json 2> runs/detector_serving.err
echo "serving-control analysis rc=$?"
echo "chain8 done"

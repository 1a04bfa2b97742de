#!/bin/bash
# Stage-12 EMA A/B, self-contained post-reset edition: the host reset
# that interrupted round 3 destroyed runs/ and data_synth/, so this
# script regenerates ONLY the prerequisites the A/B needs (synthetic
# corpora + the two identity embedders — the detector is not involved)
# and then runs the A/B itself at a 1000-step budget (the original
# runbook said 1500; 1000 keeps both arms + scoring inside one session
# on this host while leaving the EMA horizon at ~14 half-lives of
# decay=0.99, ample for the smoothing effect to express).
# Checkpoints every 500 steps so a clock cut resumes, same as the
# original runbook note (docs/TRAINING_CAMPAIGN.md stage 12).
set -ex
cd "$(dirname "$0")/.."

STEPS="${EMA_AB_STEPS:-1000}"

# --- prerequisites (idempotent) ---------------------------------------
# Guards test the artifact CONSUMED DOWNSTREAM, not the first file the
# producer writes: img.list appears before --pack finishes, so an
# interrupted synth-data would otherwise be skipped with packed/ missing.
if [ ! -f data_synth/gan/packed/index.json ]; then
python -m tpgan_tpu.cli synth-data --out data_synth --protocol both \
    --subjects 347 --pretrain-images 4000 --pack
fi
if [ ! -f data_synth/eval/img.list ]; then
python - <<'EOF'
from tpgan_tpu.data.synthetic_faces import generate_gan_protocol
lst = generate_gan_protocol("data_synth/eval", 40, start_subject=400)
print("eval items:", len(lst))
EOF
fi
if [ ! -f data_synth/embedder.list ]; then
  find data_synth/gan/train -name '*.png' | sort > data_synth/embedder.list
fi

# completed-checkpoint guard: an Orbax step dir exists only once a save
# COMPLETES (atomic rename), so `ls <ckpt>/<digits>` is the "embedder
# actually finished a save" test — a run killed pre-first-save reruns.
has_ckpt () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }

# v1 embedder: the GAN-loss instrument (round-2 recipe, campaign parity)
if ! has_ckpt runs/embedder/ckpt; then
python -m tpgan_tpu.cli train-embedder --img-list data_synth/embedder.list \
    --steps 2500 --batch-size 64 --checkpoint runs/embedder/ckpt \
    --no-augment --val-subjects 0 --log-dir runs/embedder/logs
fi
# v2 embedder: the validated metric instrument (augment + hold-out)
if ! has_ckpt runs/embedder_v2/ckpt; then
python -m tpgan_tpu.cli train-embedder --img-list data_synth/embedder.list \
    --steps 2500 --batch-size 64 --checkpoint runs/embedder_v2/ckpt \
    --log-dir runs/embedder_v2/logs
fi

# --- the A/B itself ----------------------------------------------------
run_one () {  # name ema_decay
  mkdir -p runs/ema_ab/$1
  # --resume: steps is a GLOBAL budget, so a rerun of a clock-cut arm
  # continues from the last 500-step checkpoint (and a rerun of a
  # complete arm is a no-op) instead of restarting at step 0 and
  # colliding with the already-saved Orbax steps.
  timeout 3000 python -m tpgan_tpu.cli train --packed data_synth/gan/packed \
      --device-data --steps "$STEPS" --identity-checkpoint runs/embedder/ckpt \
      --checkpoint runs/ema_ab/$1/ckpt --log-dir runs/ema_ab/$1/logs \
      $(has_ckpt runs/ema_ab/$1/ckpt && echo --resume) \
      --set train.checkpoint_every_steps=500 \
      --set G.upsample_mode=resize_conv \
      --set loss.weight_identity_preserving=0.3 \
      --set train.batch_size=128 --set train.remat=true \
      --set train.ema_decay=$2
}
run_one base 0.0
run_one ema 0.99

EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt"
timeout 1800 $EV --checkpoint runs/ema_ab/base/ckpt \
    > artifacts/eval_ema_ab_base_r4.json
timeout 1800 $EV --set train.ema_decay=0.99 --checkpoint runs/ema_ab/ema/ckpt \
    > artifacts/eval_ema_ab_ema_r4.json
# --g-weights live: ema_decay now DEFAULTS to 0.99, so a plain eval of
# the ema arm's checkpoint would restore+score the EMA weights again
# (that regression produced an ema_live file identical to the ema file
# once; caught and reverted in round 4)
timeout 1800 $EV --g-weights live --checkpoint runs/ema_ab/ema/ckpt \
    > artifacts/eval_ema_ab_ema_live_r4.json
for f in artifacts/eval_ema_ab_*_r4.json; do
  echo "== $f"; python -c "
import json,sys; d=json.load(open('$f'))
print({k: d.get(k) for k in ('psnr','ssim','rank1','identity_sim') if k in d} or {k:d[k] for k in list(d)[:6]})"
done
echo "ema_ab done"

#!/bin/bash
# Grad-accumulation QUALITY A/B (VERDICT r3 item 9): round 3 measured
# the mechanics (b=512 via accum=4 runs at 127.9 imgs/s vs b=128's 141)
# but never showed a recipe where the bigger batch buys quality per
# wall-clock. This is that experiment: two arms with an EQUAL WALL-CLOCK
# budget (not equal steps), stage-6 recipe, held-out eval at the end.
#
#   arm A: b=128, accum=1 (the campaign baseline)        — more steps
#   arm B: b=512, accum=4, lr x2 (sqrt batch-scaling for Adam) — fewer,
#          less noisy steps
#
# If B loses, the flag gets demoted to a memory-relief tool in
# docs/ARCHITECTURE.md — either way the decision is data.
set -ex
cd "$(dirname "$0")/.."

BUDGET="${ACCUM_AB_BUDGET:-1500}"   # seconds of training per arm
mkdir -p runs/accum_q_ab artifacts
has_ckpt () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }  # completed Orbax step

run_arm () {  # name batch accum lr
  mkdir -p runs/accum_q_ab/$1
  # timeout is the experiment's equal-budget mechanism: steps is set
  # far past what the budget allows, and the 2000-step checkpoints plus
  # checkpoint-on-SIGTERM... (cli saves on checkpoint_every_steps only,
  # so use a small cadence to keep the budget-cut loss bounded)
  timeout --signal=INT "$BUDGET" python -m tpgan_tpu.cli train \
      --packed data_synth/gan/packed --device-data \
      --steps 100000 --identity-checkpoint runs/embedder/ckpt \
      --checkpoint runs/accum_q_ab/$1/ckpt --log-dir runs/accum_q_ab/$1/logs \
      $(has_ckpt runs/accum_q_ab/$1/ckpt && echo --resume) \
      --set train.checkpoint_every_steps=100 \
      --set G.upsample_mode=resize_conv \
      --set loss.weight_identity_preserving=0.3 \
      --set train.batch_size=$2 \
      --set train.grad_accum_steps=$3 \
      --set train.learning_rate=$4 \
      --set train.remat=true || true
  echo "$1 finished (budget ${BUDGET}s)"
}
run_arm b128 128 1 1e-4
run_arm b512_accum4 512 4 2e-4

EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt"
timeout 1800 $EV --checkpoint runs/accum_q_ab/b128/ckpt \
    > artifacts/eval_accum_ab_b128_r4.json
timeout 1800 $EV --checkpoint runs/accum_q_ab/b512_accum4/ckpt \
    > artifacts/eval_accum_ab_b512_r4.json
for f in artifacts/eval_accum_ab_*_r4.json; do
  echo "== $f"
  python -c "
import json; d=json.load(open('$f'))
print({k: d.get(k) for k in ('psnr','ssim','rank1','identity_sim')})"
done
echo "accum quality ab done"

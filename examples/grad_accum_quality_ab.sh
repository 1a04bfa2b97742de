#!/bin/bash
# Grad-accumulation QUALITY A/B (VERDICT r3 item 9): round 3 measured
# the mechanics (b=512 via accum=4 runs at 127.9 imgs/s vs b=128's 141)
# but never showed a recipe where the bigger batch buys quality per
# wall-clock. This is that experiment: two arms with an EQUAL WALL-CLOCK
# budget of STEPPING time, stage-6 recipe, held-out eval at the end.
#
#   arm A: b=128, accum=1 (the campaign baseline)        — more steps
#   arm B: b=512, accum=4, lr x2 (sqrt batch-scaling for Adam) — fewer,
#          less noisy steps
#
# The first attempt (runs/accum_q_ab) ran equal wall-clock INCLUDING
# compile with no persistent cache: arm A lost ~1000 s of its 1500 s to
# compile (480 steps), arm B lost ALL 1500 s (zero steps, no checkpoint,
# eval crashed). Production amortises compile across restarts via the
# persistent cache (now enabled in cli.py), so the honest comparison
# warms both arms' compiles first, then gives each a fresh budgeted run.
#
# If B loses, the flag gets demoted to a memory-relief tool in
# docs/ARCHITECTURE.md — either way the decision is data.
set -ex
cd "$(dirname "$0")/.."

BUDGET="${ACCUM_AB_BUDGET:-1500}"   # seconds of training per arm
ROOT=runs/accum_q_ab2
mkdir -p "$ROOT" artifacts
has_ckpt () { ls -d "$1"/[0-9]* >/dev/null 2>&1; }  # completed Orbax step

train_args () {  # batch accum lr ckpt_dir log_dir extra...
  local batch=$1 accum=$2 lr=$3 ckpt=$4 log=$5; shift 5
  echo --packed data_synth/gan/packed --device-data \
      --identity-checkpoint runs/embedder/ckpt \
      --checkpoint "$ckpt" --log-dir "$log" \
      --set G.upsample_mode=resize_conv \
      --set loss.weight_identity_preserving=0.3 \
      --set train.batch_size=$batch \
      --set train.grad_accum_steps=$accum \
      --set train.learning_rate=$lr \
      --set train.remat=true "$@"
}

warm_arm () {  # name batch accum lr — populate the XLA cache only
  [ -f "$ROOT/$1.warm" ] && return 0
  mkdir -p "$ROOT/warm_$1"
  timeout 3600 python -m tpgan_tpu.cli train \
      $(train_args "$2" "$3" "$4" "$ROOT/warm_$1/ckpt" \
        "$ROOT/warm_$1/logs" --steps 12 \
        --set train.checkpoint_every_steps=100000) || true
  touch "$ROOT/$1.warm"
}

run_arm () {  # name batch accum lr — fresh budgeted run, warm cache
  [ -f "$ROOT/$1.done" ] && return 0
  mkdir -p "$ROOT/$1"
  timeout --signal=INT "$BUDGET" python -m tpgan_tpu.cli train \
      $(train_args "$2" "$3" "$4" "$ROOT/$1/ckpt" "$ROOT/$1/logs" \
        --steps 100000 --set train.checkpoint_every_steps=100 \
        $(has_ckpt "$ROOT/$1/ckpt" && echo --resume)) || true
  # done only if the budget produced at least one complete checkpoint
  has_ckpt "$ROOT/$1/ckpt" && touch "$ROOT/$1.done"
  echo "$1 finished (budget ${BUDGET}s)"
}

warm_arm b128 128 1 1e-4
warm_arm b512_accum4 512 4 2e-4
run_arm b128 128 1 1e-4
run_arm b512_accum4 512 4 2e-4

EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt"
timeout 1800 $EV --checkpoint "$ROOT/b128/ckpt" \
    > artifacts/eval_accum_ab_b128_r5.json
timeout 1800 $EV --checkpoint "$ROOT/b512_accum4/ckpt" \
    > artifacts/eval_accum_ab_b512_r5.json
for f in artifacts/eval_accum_ab_*_r5.json; do
  echo "== $f"
  python -c "
import json; d=json.load(open('$f'))
print({k: d.get(k) for k in ('psnr','ssim','rank1','identity_sim')})"
done
echo "accum quality ab done"

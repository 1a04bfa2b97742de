#!/bin/bash
# EMA quality A/B (round 3): does train.ema_decay improve synthesis
# quality at a fixed training budget? two 1500-step runs of the stage-6
# recipe (resize_conv, identity 0.3, b=128, remat, device-resident
# feed) differing ONLY in train.ema_decay (0 vs 0.99, half-life ~69
# steps — matched to the 1.5k-step horizon), each scored on the held-out
# 320-probe set. The EMA run is scored twice: EMA weights (the default
# eval path) and live weights (--set train.ema_decay=0 at eval restores
# the same checkpoint but selects live params), isolating the EMA
# smoothing effect from run-to-run variance.
set -ex
run_one () {  # name ema_decay
  mkdir -p runs/ema_ab/$1
  timeout 3600 python -m tpgan_tpu.cli train --packed data_synth/gan/packed \
      --device-data --steps 1500 --identity-checkpoint runs/embedder/ckpt \
      --checkpoint runs/ema_ab/$1/ckpt --log-dir runs/ema_ab/$1/logs \
      --set train.checkpoint_every_steps=1500 \
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
    > artifacts/eval_ema_ab_base_r3.json
timeout 1800 $EV --set train.ema_decay=0.99 --checkpoint runs/ema_ab/ema/ckpt \
    > artifacts/eval_ema_ab_ema_r3.json
timeout 1800 $EV --checkpoint runs/ema_ab/ema/ckpt \
    > artifacts/eval_ema_ab_ema_live_r3.json
for f in artifacts/eval_ema_ab_*_r3.json; do
  echo "== $f"; python -c "
import json,sys; d=json.load(open('$f'))
print({k: d.get(k) for k in ('psnr','ssim','rank1','identity_sim') if k in d} or {k:d[k] for k in list(d)[:6]})"
done

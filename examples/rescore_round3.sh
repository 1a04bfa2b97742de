#!/bin/bash
# Round-3 re-scoring: all three 10k-step runs (stage-3 parity/deconv,
# stage-6 resize_conv, round-3 A/B deconv+id0.3) on the fixed
# (cancellation-safe, range-clipped) SSIM, with z-variance (4 draws)
# and the validated embedder_v2; plus the full-stack (detected-landmark)
# variants. One chip session, ~40 min. Outputs artifacts/eval_*_r3.json.
set -ex
head -320 data_synth/gan/img.list > /tmp/train320.list
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4"
HELD="--img-list data_synth/eval/img.list --set train.img_list=data_synth/eval/img.list"
TRAIN="--img-list /tmp/train320.list --set train.img_list=/tmp/train320.list"
E2="--identity-checkpoint runs/embedder_v2/ckpt"
E1="--identity-checkpoint runs/embedder/ckpt"
RC="--set G.upsample_mode=resize_conv"
# best detector: pretrain_v2 (lr-variant) best-val ckpt, step 600,
# val banded accuracy 0.737 (vs 0.713 for the completed 2360 schedule)
DET="--detector-checkpoint runs/pretrain_v2/ckpt/best"

# held-out (320 unseen-subject probes), GT landmarks
$EV $HELD $E2 --checkpoint runs/gan/ckpt     > artifacts/eval_heldout_stage3_r3.json
$EV $HELD $E2 --checkpoint runs/gan_rc/ckpt $RC > artifacts/eval_heldout_stage6_r3.json
$EV $HELD $E2 --checkpoint runs/gan_ab/ckpt  > artifacts/eval_heldout_ab_r3.json
# embedder-bridge: stage-6 heldout with the round-2 (v1) embedder
$EV $HELD $E1 --checkpoint runs/gan_rc/ckpt $RC > artifacts/eval_heldout_stage6_r3_embv1.json

# training distribution (320 probes)
$EV $TRAIN $E2 --checkpoint runs/gan_rc/ckpt $RC > artifacts/eval_train_stage6_r3.json
$EV $TRAIN $E2 --checkpoint runs/gan_ab/ckpt > artifacts/eval_train_ab_r3.json

# FULL-STACK: landmarks from the trained detector (no annotations)
$EV $HELD $E2 --checkpoint runs/gan_rc/ckpt $RC $DET > artifacts/eval_heldout_stage6_fullstack_r3.json
$EV $HELD $E2 --checkpoint runs/gan_ab/ckpt $DET > artifacts/eval_heldout_ab_fullstack_r3.json

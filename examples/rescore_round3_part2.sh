#!/bin/bash
# Remaining half of examples/rescore_round3.sh (the first 4 held-out
# evals were produced and committed in 4253ba1): training-distribution
# scores plus the FULL-STACK (detected-landmark) held-out evals that
# close VERDICT item 4. One chip session.
set -ex
head -320 data_synth/gan/img.list > /tmp/train320.list
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4"
HELD="--img-list data_synth/eval/img.list --set train.img_list=data_synth/eval/img.list"
TRAIN="--img-list /tmp/train320.list --set train.img_list=/tmp/train320.list"
E2="--identity-checkpoint runs/embedder_v2/ckpt"
RC="--set G.upsample_mode=resize_conv"
DET="--detector-checkpoint runs/pretrain_v2/ckpt/best"

# training distribution (320 probes)
$EV $TRAIN $E2 --checkpoint runs/gan_rc/ckpt $RC > artifacts/eval_train_stage6_r3.json
$EV $TRAIN $E2 --checkpoint runs/gan_ab/ckpt > artifacts/eval_train_ab_r3.json

# FULL-STACK: landmarks from the trained detector (no annotations)
$EV $HELD $E2 --checkpoint runs/gan_rc/ckpt $RC $DET > artifacts/eval_heldout_stage6_fullstack_r3.json
$EV $HELD $E2 --checkpoint runs/gan_ab/ckpt $DET > artifacts/eval_heldout_ab_fullstack_r3.json

#!/bin/bash
# Round-3 rerun, stage 3: the outstanding eval matrix for the fresh
# stage-6-config generator (VERDICT item 4 — the GT-landmark vs
# detected-landmark full-stack delta table), plus this session's
# GT-landmark held-out score so the table is internally consistent
# (the generator is a fresh retrain, not the destroyed checkpoint).
set -ex
cd "$(dirname "$0")/.."
head -320 data_synth/gan/img.list > /tmp/train320.list
EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 4"
HELD="--img-list data_synth/eval/img.list --set train.img_list=data_synth/eval/img.list"
TRAIN="--img-list /tmp/train320.list --set train.img_list=/tmp/train320.list"
E2="--identity-checkpoint runs/embedder_v2/ckpt"
RC="--set G.upsample_mode=resize_conv"
DET="--detector-checkpoint runs/pretrain_v2/ckpt/best"

# held-out (320 unseen-subject probes), GT landmarks — fresh-retrain score
$EV $HELD $E2 --checkpoint runs/gan_rc/ckpt $RC > artifacts/eval_heldout_stage6r_r3.json
# training distribution (320 probes)
$EV $TRAIN $E2 --checkpoint runs/gan_rc/ckpt $RC > artifacts/eval_train_stage6r_r3.json
# FULL-STACK: landmarks from the trained detector (no annotations)
$EV $HELD $E2 --checkpoint runs/gan_rc/ckpt $RC $DET > artifacts/eval_heldout_stage6r_fullstack_r3.json
echo "stage 3 done"

#!/bin/bash
# Harder identity-evaluation protocol (VERDICT r3 item 5): the
# 40-subject held-out protocol saturates Rank-1 at 1.000 for every
# round-3 model, so the identity axis no longer discriminates. This
# builds a second protocol that restores headroom:
#   * 300 UNSEEN gallery subjects (ids 600-899) — 7.5x the gallery,
#     7.5x the confusion candidates;
#   * the full 13-camera ring including the extreme poses
#     (+/-75, +/-90 — synthetic_faces.EXTREME_CAMERA_YAWS), where the
#     far half of the face is foreshortened away;
# and scores the CURRENT generator on BOTH protocols side by side
# (the 40-subject one stays for cross-round continuity).
set -ex
cd "$(dirname "$0")/.."

CKPT="${1:-runs/gan_rc/ckpt}"

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

EV="python -m tpgan_tpu.cli eval --batch-size 16 --z-samples 1 \
    --set G.upsample_mode=resize_conv \
    --identity-checkpoint runs/embedder_v2/ckpt --checkpoint $CKPT"
# old protocol (40 subjects, 9 cameras) — continuity row
timeout 1800 $EV --img-list data_synth/eval/img.list \
    --set train.img_list=data_synth/eval/img.list \
    > artifacts/eval_protocol40_r4.json
# hard protocol (300 subjects, 13 cameras incl. +/-90)
timeout 5400 $EV --img-list data_synth/eval_hard/img.list \
    --set train.img_list=data_synth/eval_hard/img.list \
    > artifacts/eval_protocol300_hard_r4.json

for f in artifacts/eval_protocol40_r4.json artifacts/eval_protocol300_hard_r4.json; do
  echo "== $f"
  python -c "
import json; d=json.load(open('$f'))
print({k: d.get(k) for k in ('psnr','ssim','rank1','identity_sim','num_images')})"
done
echo "hard protocol done"

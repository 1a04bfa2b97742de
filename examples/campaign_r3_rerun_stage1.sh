#!/bin/bash
# Round-3 rerun, stage 1: the host was reset between round-3 sessions
# (runs/ and data_synth/ wiped), so the checkpoints behind the four
# outstanding evals (examples/rescore_round3_part2.sh) no longer exist.
# This regenerates the data and retrains the small models exactly per
# the campaign runbook (docs/TRAINING_CAMPAIGN.md):
#   - synthetic corpora (GAN protocol 347 subjects, pretrain 4000 imgs,
#     held-out eval protocol: 40 unseen subjects 400-439)
#   - identity embedder v1 (round-2 recipe: no augment, no hold-out)
#   - identity embedder v2 (validated: augment + 20 held-out subjects)
#   - landmark detector (pretrain_v2 recipe: LR milestones (20,30))
set -ex
cd "$(dirname "$0")/.."

if [ ! -f data_synth/gan/img.list ]; then
python -m tpgan_tpu.cli synth-data --out data_synth --protocol both \
    --subjects 347 --pretrain-images 4000 --pack
fi

# held-out eval protocol: 40 UNSEEN subjects (ids 400-439)
if [ ! -f data_synth/eval/img.list ]; then
python - <<'EOF'
from tpgan_tpu.data.synthetic_faces import generate_gan_protocol
lst = generate_gan_protocol("data_synth/eval", 40, start_subject=400)
print("eval items:", len(lst))
EOF
fi

# embedder list: every prepared 128x128 protocol image (frontal
# included) — the 3,123 train/ pngs (347 subjects x 9 cameras)
find data_synth/gan/train -name '*.png' | sort > data_synth/embedder.list
wc -l data_synth/embedder.list

mkdir -p runs/embedder runs/embedder_v2 runs/pretrain_v2 artifacts
# v1 — round-2 recipe (the GAN loss instrument, stages 3/6/7 parity)
python -m tpgan_tpu.cli train-embedder --img-list data_synth/embedder.list \
    --steps 2500 --batch-size 64 --checkpoint runs/embedder/ckpt \
    --no-augment --val-subjects 0 --log-dir runs/embedder/logs

# v2 — validated metric instrument (augment + 20-subject hold-out)
python -m tpgan_tpu.cli train-embedder --img-list data_synth/embedder.list \
    --steps 2500 --batch-size 64 --checkpoint runs/embedder_v2/ckpt \
    --log-dir runs/embedder_v2/logs
cp runs/embedder_v2/logs/metrics.jsonl artifacts/embedder_v2_metrics.jsonl || true

# landmark detector — pretrain_v2 recipe (best val 0.737 in the prior
# session; best checkpoint kept by validation accuracy)
python -m tpgan_tpu.cli pretrain --checkpoint runs/pretrain_v2/ckpt \
    --set pretrain.data_root_dir=data_synth/pretrain \
    --set "pretrain.image_buckets=(256,320)" \
    --set pretrain.validation_data_ratio=0.02 \
    --set "pretrain.learning_rate_scheduler_milestone=(20,30)" \
    --set pretrain.log_root_dir=runs/pretrain_v2/logs \
    --set pretrain.num_epochs=40
echo "stage 1 done"

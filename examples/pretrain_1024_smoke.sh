#!/bin/bash
# 1024-bucket pretrain smoke (round-2 verdict item 9): synthetic CelebA
# protocol images spanning 256-1024 px, multi-bucket letterbox routing
# over buckets (256, 512, 1024) — the reference's image_max_size intent
# (reference config.py:40, collate filter Pretrain.py:66-74). Trains a
# detector from scratch for 40 epochs at b=16 on the chip, then scores
# banded accuracy per bucket (examples/bucket_parity_eval.py).
set -ex

# sizes 160-1024 so every bucket is populated (size<=256 -> bucket 256,
# 257-512 -> 512, 513-1024 -> 1024; uniform draw gives ~11%/36%/52%)
if [ ! -f data_synth/pretrain1024/list_landmarks_celeba.txt ]; then
python - <<'EOF'
from tpgan_tpu.data.synthetic_faces import generate_pretrain_protocol
txt = generate_pretrain_protocol(
    "data_synth/pretrain1024", 900, sizes=(160, 1024), num_subjects=256,
    seed=7,
)
print("generated", txt)
EOF
fi

mkdir -p runs/pretrain1024
# --device-data: the per-step H2D feed hits the tunnel client's
# device_put buffer leak (the first attempt at this smoke grew to
# 130 GB host RSS and was OOM-killed; docs/BENCHMARKS.md) — per-bucket
# HBM residency caps steady-state H2D at the index vector
# batch_size applies at the SMALLEST bucket; pixel-budget batching
# scales it down by area per bucket (64 -> 16 -> 4), holding the
# activation footprint constant (b=16 at the 1024 bucket exhausted the
# 16 GB HBM on the first device-resident attempt)
time python -m tpgan_tpu.cli pretrain --device-data \
    --checkpoint runs/pretrain1024/ckpt \
    --set pretrain.data_root_dir=data_synth/pretrain1024 \
    --set "pretrain.image_buckets=(256,512,1024)" \
    --set pretrain.batch_size=64 \
    --set pretrain.train_data_ratio=0.85 \
    --set pretrain.validation_data_ratio=0.1 \
    --set pretrain.log_step_of_batchs=200 \
    --set pretrain.log_root_dir=runs/pretrain1024/logs \
    --set pretrain.num_epochs=20

python examples/bucket_parity_eval.py \
    --checkpoint runs/pretrain1024/ckpt/best \
    --data-root data_synth/pretrain1024 \
    --buckets 256,512,1024 --batch-size 16 \
    | tee artifacts/bucket_parity_1024_r3.json

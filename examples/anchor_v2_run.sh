#!/bin/bash
# Anchor-offset detector, recipe v2: the naive anchor run converged its
# loss but decoded at 32 px error — with 10% of anchors as positives the
# argmax-score anchor is often a far cell with a noisy long-range offset
# (docs/ARCHITECTURE.md §8). v2 restricts the positive set to the cells
# around each GT point (distance_threshold_ratio 0.1 -> 0.01) so
# classification rewards exactly the anchors whose offsets decode best.
# Safe to run concurrently with the GAN retrain (tunnel serialises
# dispatches; both make progress) — it must only NOT overlap another
# pretrain using the same checkpoint dir.
set -x
cd "$(dirname "$0")/.."

# wait until no other pretrain run is active (the chain-1 anchor run)
while ps aux | grep -q "[c]li pretrain"; do sleep 60; done

mkdir -p runs/pretrain_anchor2
time python -m tpgan_tpu.cli pretrain --checkpoint runs/pretrain_anchor2/ckpt \
    --device-data \
    --set pretrain.data_root_dir=data_synth/pretrain \
    --set "pretrain.image_buckets=(256,320)" \
    --set pretrain.validation_data_ratio=0.02 \
    --set "pretrain.learning_rate_scheduler_milestone=(20,30)" \
    --set pretrain.log_root_dir=runs/pretrain_anchor2/logs \
    --set pretrain.head_mode=anchor_offset \
    --set pretrain.loss.distance_threshold_ratio=0.01 \
    --set pretrain.num_epochs=40 > runs/pretrain_anchor2.log 2>&1
echo "anchor v2 rc=$?"
python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor2/ckpt/best \
    > artifacts/detector_error_analysis_anchor2_r4.json 2> /dev/null
echo "anchor v2 done"
touch runs/pretrain_anchor2.done

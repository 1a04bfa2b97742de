#!/bin/bash
# Anchor-offset detector, recipe v3. History: the naive anchor run (v1,
# parity assignment) decoded at 32 px; v2 (prediction-based assignment
# with ratio 0.01) was WORSE (78 px) because positives-by-prediction-
# distance is a moving target under argmax-anchor decode. v3 switches
# the positive assignment itself to the STATIC anchor grid
# (losses/multitask.assign_points, automatic for anchor_offset heads) +
# ratio 0.01: classification learns "the GT is near my cell", exactly
# the anchors whose small offsets decode best — the standard SSD/FCOS
# construction, expressed on the reference's loss skeleton.
# Safe to run concurrently with the GAN retrain (tunnel serialises
# dispatches; both make progress) — it must only NOT overlap another
# pretrain using the same checkpoint dir.
set -x
cd "$(dirname "$0")/.."

# wait until no other pretrain run is active (the chain-1 anchor run)
while ps aux | grep -q "[c]li pretrain"; do sleep 60; done

mkdir -p runs/pretrain_anchor3
time python -m tpgan_tpu.cli pretrain --checkpoint runs/pretrain_anchor3/ckpt \
    --device-data \
    --set pretrain.data_root_dir=data_synth/pretrain \
    --set "pretrain.image_buckets=(256,320)" \
    --set pretrain.validation_data_ratio=0.02 \
    --set "pretrain.learning_rate_scheduler_milestone=(20,30)" \
    --set pretrain.log_root_dir=runs/pretrain_anchor3/logs \
    --set pretrain.head_mode=anchor_offset \
    --set pretrain.loss.distance_threshold_ratio=0.01 \
    --set pretrain.num_epochs=40 > runs/pretrain_anchor3.log 2>&1
echo "anchor v2 rc=$?"
python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor3/ckpt/best \
    > artifacts/detector_error_analysis_anchor3_r4.json 2> /dev/null
echo "anchor v2 done"
touch runs/pretrain_anchor2.done

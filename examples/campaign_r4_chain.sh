#!/bin/bash
# Round-4 chip queue, part 1: waits for the stage-1 regen (data +
# embedders + BASELINE detector, PID in /tmp/stage1.pid), then:
#   1. trains the anchor-offset detector — identical recipe to the
#      baseline (pretrain_v2: buckets 256/320, LR milestones (20,30),
#      40 epochs) with head_mode as the single variable under test
#      (VERDICT r3 item 1: break the 12 px localization ceiling)
#   2. per-part error analysis on BOTH detectors -> artifacts/
#   3. the stage-6-recipe 10k-step GAN retrain (the quality-headline
#      generator every downstream eval consumes)
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/stage1.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "stage1 finished"

mkdir -p runs/pretrain_anchor artifacts
# --device-data: the host-feed path leaks ~30 MB/step of tunnel-client
# device_put buffers (docs/BENCHMARKS.md round-2 finding; the baseline
# run reproduced it at 70 GB RSS mid-run), and the HBM-resident feed is
# also the faster path.
time python -m tpgan_tpu.cli pretrain --checkpoint runs/pretrain_anchor/ckpt \
    --device-data \
    --set pretrain.data_root_dir=data_synth/pretrain \
    --set "pretrain.image_buckets=(256,320)" \
    --set pretrain.validation_data_ratio=0.02 \
    --set "pretrain.learning_rate_scheduler_milestone=(20,30)" \
    --set pretrain.log_root_dir=runs/pretrain_anchor/logs \
    --set pretrain.head_mode=anchor_offset \
    --set pretrain.num_epochs=40 > runs/pretrain_anchor.log 2>&1
echo "anchor detector rc=$?"

python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_v2/ckpt/best \
    > artifacts/detector_error_analysis_base_r4.json 2> /dev/null
python examples/detector_error_analysis.py \
    --checkpoint runs/pretrain_anchor/ckpt/best \
    > artifacts/detector_error_analysis_anchor_r4.json 2> /dev/null
echo "error analyses done"

bash examples/campaign_r3_rerun_stage2.sh > runs/stage2_rerun.log 2>&1
echo "stage2 (GAN 10k) rc=$?"
echo "chain1 done"

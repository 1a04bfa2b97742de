#!/bin/bash
# Round-3 rerun, stage 2: the stage-6-config GAN run (resize_conv,
# id-weight 0.3, device-resident feed) — the quality-headline generator
# whose checkpoint the host reset destroyed. 10k steps, b=128, remat;
# ~2.7h at the 131 imgs/s/chip sustained rate of the prior session.
set -ex
cd "$(dirname "$0")/.."
# round-4 sequencing: let the anchor-v2 detector retrain finish first --
# both jobs want most of the chip HBM (b=128+remat GAN vs device-resident
# pretrain stacks), so overlapping risks a device OOM on the critical path
while [ -f /tmp/anchor_v2.pid ] && [ ! -f runs/pretrain_anchor2.done ]; do sleep 60; done
mkdir -p runs/gan_rc
time python -m tpgan_tpu.cli train --packed data_synth/gan/packed \
    --steps 10000 --identity-checkpoint runs/embedder/ckpt \
    --checkpoint runs/gan_rc/ckpt --sample-dir runs/gan_rc/samples \
    --log-dir runs/gan_rc/logs --sample-every 2000 --device-data \
    --set train.batch_size=128 \
    --set train.remat=true --set train.checkpoint_every_steps=2000 \
    --set G.upsample_mode=resize_conv \
    --set loss.weight_identity_preserving=0.3
echo "stage 2 done"

#!/bin/bash
# Throughput probe for the opt-in bf16 identity embedder in the GAN loss
# (`cli train --identity-embed-dtype bfloat16`, commit 00945ab).
# Identical config to the stage-7 A/B run (b=128, remat, device-resident
# feed, id-weight 0.3) whose f32 steady state is 141.3 imgs/s/chip
# (tail-500-step mean of runs/gan_ab/logs/metrics.jsonl); 150 steps,
# throughput read from the metrics tail (steps 60-150).
set -ex
mkdir -p runs/probe_bf16emb
time python -m tpgan_tpu.cli train --packed data_synth/gan/packed \
    --steps 150 --identity-checkpoint runs/embedder/ckpt \
    --identity-embed-dtype bfloat16 \
    --checkpoint runs/probe_bf16emb/ckpt --sample-dir runs/probe_bf16emb/samples \
    --log-dir runs/probe_bf16emb/logs --sample-every 100000 --device-data \
    --set train.batch_size=128 \
    --set train.remat=true --set train.checkpoint_every_steps=100000 \
    --set loss.weight_identity_preserving=0.3
python - <<'EOF'
import json
vals = [json.loads(l)["imgs_per_sec"]
        for l in open("runs/probe_bf16emb/logs/metrics.jsonl")]
tail = vals[5:]  # skip warmup/compile windows (steps 10-50)
print(json.dumps({"bf16_embedder_imgs_per_sec_tail_mean":
                  round(sum(tail) / len(tail), 1),
                  "windows": [round(v, 1) for v in vals],
                  "f32_baseline": 141.3}))
EOF

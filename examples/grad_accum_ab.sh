#!/bin/bash
# Grad-accumulation on-chip A/B (round 3): can train.grad_accum_steps
# push the effective per-chip batch past the b=128 HBM wall
# (docs/BENCHMARKS.md), and what does it cost in imgs/s? Short runs on
# the packed synthetic corpus, device-resident feed, same flags as the
# stage-2 campaign run apart from the variables under test.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs/accum_ab artifacts

COMMON="--packed data_synth/gan/packed --device-data --steps 120
  --identity-checkpoint runs/embedder/ckpt
  --set train.checkpoint_every_steps=100000
  --set G.upsample_mode=resize_conv
  --set loss.weight_identity_preserving=0.3"

run_one () {  # name batch accum remat
  timeout 1500 python -m tpgan_tpu.cli train $COMMON \
    --log-dir runs/accum_ab/$1 \
    --set train.batch_size=$2 \
    --set train.grad_accum_steps=$3 \
    --set train.remat=$4 > runs/accum_ab/$1.log 2>&1
  echo "$1 rc=$?"
}

run_one b256_accum2_remat 256 2 true
run_one b256_accum2_noremat 256 2 false
run_one b512_accum4_remat 512 4 true

python - <<'EOF'
import json, os
out = {}
for name in ("b256_accum2_remat", "b256_accum2_noremat", "b512_accum4_remat"):
    path = f"runs/accum_ab/{name}/metrics.jsonl"
    if not os.path.exists(path):
        out[name] = {"error": "no metrics (OOM or crash — see .log)"}
        continue
    rates = [json.loads(l).get("imgs_per_sec") for l in open(path)]
    rates = [r for r in rates if r][3:]  # drop compile/warmup windows
    rates.sort()
    out[name] = ({"imgs_per_sec_median": rates[len(rates) // 2],
                  "windows": len(rates)} if rates
                 else {"error": "no throughput windows"})
print(json.dumps(out, indent=1))
EOF

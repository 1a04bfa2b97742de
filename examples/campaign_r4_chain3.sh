#!/bin/bash
# Round-4 chip queue, part 3 (VERDICT item 4 — roofline the train step
# like synthesis was rooflined): waits for chain 2, then
#   1. XLA cost-model FLOPs of the fused D+G step (remat on/off, with
#      and without the identity embedder, both embed dtypes)
#   2. same-session 150-step throughput probes: f32 embedder control vs
#      --identity-embed-dtype bfloat16 (the promised measured lever)
#   3. a bench.py refresh so BENCH_r04 carries the new honest fields
set -x
cd "$(dirname "$0")/.."

PID=$(cat /tmp/chain2.pid 2>/dev/null)
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do sleep 120; done
echo "chain2 finished"

mkdir -p artifacts runs
{
  echo '{'
  echo -n '"train_remat_id_f32": '
  timeout 1200 python examples/roofline.py --train --batch 16 || echo '{}'
  echo -n ', "train_remat_id_bf16": '
  timeout 1200 python examples/roofline.py --train --batch 16 --embed-dtype bfloat16 || echo '{}'
  echo -n ', "train_noremat_id_f32": '
  timeout 1200 python examples/roofline.py --train --batch 16 --no-remat || echo '{}'
  echo -n ', "train_remat_noid": '
  timeout 1200 python examples/roofline.py --train --batch 16 --no-identity || echo '{}'
  echo -n ', "synthesis": '
  timeout 1200 python examples/roofline.py || echo '{}'
  echo '}'
} > artifacts/roofline_train_r4.json 2> runs/roofline_train.err
echo "train roofline rc=$?"

# f32 control probe, same recipe/session as the bf16 probe
mkdir -p runs/probe_f32emb
timeout 1200 python -m tpgan_tpu.cli train --packed data_synth/gan/packed \
    --steps 150 --identity-checkpoint runs/embedder/ckpt \
    --checkpoint runs/probe_f32emb/ckpt \
    --log-dir runs/probe_f32emb/logs --sample-every 100000 --device-data \
    --set train.batch_size=128 \
    --set train.remat=true --set train.checkpoint_every_steps=100000 \
    --set loss.weight_identity_preserving=0.3 > runs/probe_f32emb.log 2>&1
bash examples/bf16_embedder_probe.sh > runs/probe_bf16emb.log 2>&1
python - <<'EOF' > artifacts/train_probe_r4.json
import json
def tail_mean(path):
    vals = [json.loads(l)["imgs_per_sec"] for l in open(path)]
    t = vals[5:] or vals
    return round(sum(t) / len(t), 1)
print(json.dumps({
    "f32_embedder_imgs_per_sec": tail_mean("runs/probe_f32emb/logs/metrics.jsonl"),
    "bf16_embedder_imgs_per_sec": tail_mean("runs/probe_bf16emb/logs/metrics.jsonl"),
    "recipe": "b=128 remat device-data id-weight 0.3 (stage-7 parity)",
}))
EOF
echo "embed-dtype probes rc=$?"

timeout 560 python bench.py > runs/bench_r4_preflight.out 2> runs/bench_r4_preflight.err
tail -1 runs/bench_r4_preflight.out
echo "chain3 done"

"""On-chip A/B of the int8 serving-graph tuning knobs (VERDICT r3
item 3: int8 runs at 55% of int8 peak vs bf16's 82% of bf16 peak —
the quantize/dequantize epilogues own the gap).

Variants (ops/quant.quant_config):
* rescale_dtype: f32 (round-3 default) vs bf16 — the dequantize
  epilogue's arithmetic/storage dtype;
* min_channels: 0 (quantize everything, round-3 default) vs 96/128 —
  narrow convs are HBM-bound, so int8 buys them little while their
  epilogues still cost.

Methodology = bench.py's sequential scan (data-dependent z chain, one
scalar fetch), same batch size, same calibration, so numbers are
directly comparable with the bench headline.

Usage: python examples/int8_variants_probe.py [--batch 256] [--scan 20]
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

import bench  # reuse the bench batch + cache configuration
from tpgan_tpu.config import make_config
from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn
from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn


def measure(synthesize, g_params, batch_size, scan_len, repeats=3):
    batch = bench._bench_batch(batch_size)
    z = jnp.zeros((batch_size, 64), jnp.float32)

    @jax.jit
    def scan_bench(params, batch, z0):
        def body(carry, _):
            acc, z = carry
            out = synthesize(params, batch, z)
            s = jnp.sum(out.astype(jnp.float32))
            return (acc + s, z + s * 1e-12), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), z0), None, length=scan_len
        )
        return acc

    float(scan_bench(g_params, batch, z))  # compile + warm
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(scan_bench(g_params, batch, z))
        dt = min(dt, time.perf_counter() - t0)
    return batch_size * scan_len / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=20)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = make_config({"compute_dtype": "bfloat16"})
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    scales = calibrate_synthesis(
        cfg, gen, state.g_params, [jax.device_get(bench._bench_batch(16))]
    )

    variants = {
        "bf16_reference": make_synthesize_fn(cfg, gen),
        "int8_f32rescale_all": make_int8_synthesize_fn(cfg, gen, scales),
        "int8_bf16rescale_all": make_int8_synthesize_fn(
            cfg, gen, scales, rescale_dtype=jnp.bfloat16
        ),
        "int8_bf16rescale_min96": make_int8_synthesize_fn(
            cfg, gen, scales, rescale_dtype=jnp.bfloat16, min_channels=96
        ),
        "int8_bf16rescale_min128": make_int8_synthesize_fn(
            cfg, gen, scales, rescale_dtype=jnp.bfloat16, min_channels=128
        ),
        "int8_f32rescale_min128": make_int8_synthesize_fn(
            cfg, gen, scales, min_channels=128
        ),
    }
    out = {}
    for name, fn in variants.items():
        try:
            out[name] = round(
                measure(fn, state.g_params, args.batch, args.scan), 1
            )
        except Exception as e:
            out[name] = f"failed: {e!r}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"batch": args.batch, "imgs_per_sec": out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""On-chip A/B: dilated vs subpixel transposed-conv algorithm.

The generator's upsamplers are torch-parity ConvTranspose2d ops. The
``dilated`` algorithm (round 1-3) interleaves stride-1 zeros into the
input and pays MXU MACs for all of them (3/4 wasted at stride 2, 15/16
at stride 4). ``subpixel`` (ops/blocks._subpixel_plan) computes the
identical math as one stride-1 VALID conv over a phase-rearranged
weight + depth-to-space. This probe measures whether XLA:TPU already
strength-reduces the dilated form (in which case both time the same) or
whether the decomposition's 2.25-16x MAC cut is real wall-clock.

Methodology = bench.py's sequential scan (data-dependent z chain, one
scalar fetch), same batch size, same calibration, so the numbers are
directly comparable with the bench headline and with
examples/int8_variants_probe.py.

Usage: python examples/subpixel_probe.py [--batch 256] [--scan 20]
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

    results = {}
    for algo in ("deconv", "subpixel"):
        cfg = make_config(
            {"compute_dtype": "bfloat16", "G": {"upsample_mode": algo}}
        )
        state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
        r = measure(
            make_synthesize_fn(cfg, gen), state.g_params,
            args.batch, args.scan,
        )
        results[f"bf16_{algo}"] = round(r, 1)
        print(json.dumps({f"bf16_{algo}": results[f"bf16_{algo}"]}),
              flush=True)

        scales = calibrate_synthesis(
            cfg, gen, state.g_params,
            [jax.device_get(bench._bench_batch(16))],
        )
        r = measure(
            make_int8_synthesize_fn(
                cfg, gen, scales, rescale_dtype=jnp.bfloat16
            ),
            state.g_params, args.batch, args.scan,
        )
        results[f"int8_{algo}"] = round(r, 1)
        print(json.dumps({f"int8_{algo}": results[f"int8_{algo}"]}),
              flush=True)

    print(json.dumps({
        "batch": args.batch, "scan": args.scan,
        "imgs_per_sec": results,
        "speedup_bf16": round(
            results["bf16_subpixel"] / results["bf16_deconv"], 3),
        "speedup_int8": round(
            results["int8_subpixel"] / results["int8_deconv"], 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

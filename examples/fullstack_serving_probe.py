"""On-chip throughput of the FULL-STACK serving program — raw uint8
bytes -> letterbox upscale -> detector -> soft decode -> patch crops ->
generator -> frontal face, one dispatch — vs the synthesis-only
headline, in bf16 and with the int8 PTQ generator stage.

Quantifies what the deployment path costs over bare synthesis (the
detector forward + decode + on-device preprocessing), measured with the
bench.py dependent-scan methodology so the numbers sit next to the
bench headline (946 bf16 / 1282-1328 int8 imgs/s/chip synthesis-only).

Uses random init unless checkpoints are given — throughput is
weight-independent; pass --checkpoint/--detector-checkpoint to also
bake the real weights (identical timing, useful as an artifact drill).

Usage: python examples/fullstack_serving_probe.py [--batch 256]
       [--scan 20] [--input-size 128]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import bench  # bench cache config + batch helper
from tpgan_tpu.config import make_config
from tpgan_tpu.frontalize import make_frontalize_fn
from tpgan_tpu.ops.quant import calibrate_synthesis
from tpgan_tpu.train.gan_trainer import create_gan_state
from tpgan_tpu.train.pretrain import create_pretrain_state


def measure(fn, g_params, det_vars, images, z0, scan_len, repeats=3):
    @jax.jit
    def scan_bench(g_params, det_vars, images, z0):
        def body(carry, _):
            acc, z = carry
            fake, _lm5, _scores = fn(g_params, det_vars, images, z)
            s = jnp.sum(fake.astype(jnp.float32))
            return (acc + s, z + s * 1e-12), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), z0), None, length=scan_len
        )
        return acc

    float(scan_bench(g_params, det_vars, images, z0))  # compile + warm
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(scan_bench(g_params, det_vars, images, z0))
        dt = min(dt, time.perf_counter() - t0)
    return images.shape[0] * scan_len / dt


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--input-size", type=int, default=128)
    ap.add_argument("--detector-size", type=int, default=256)
    ap.add_argument("--tta", action="store_true")
    args = ap.parse_args()

    cfg = make_config({"compute_dtype": "bfloat16"})
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    det_state, detector, _tx = create_pretrain_state(
        cfg, jax.random.PRNGKey(1)
    )
    det_vars = {"params": det_state.params,
                "batch_stats": det_state.batch_stats}

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        (rng.rand(args.batch, args.input_size, args.input_size, 3) * 255)
        .astype(np.uint8)
    )
    z = jnp.zeros((args.batch, cfg.G.zdim), jnp.float32)

    results = {}
    for mode in ("bf16", "int8"):
        scales = None
        if mode == "int8":
            scales = calibrate_synthesis(
                cfg, gen, state.g_params,
                [jax.device_get(bench._bench_batch(16))],
            )
        fn = make_frontalize_fn(
            cfg, detector, gen, detector_size=args.detector_size,
            tta=args.tta, quant_scales=scales,
            quant_rescale_dtype=jnp.bfloat16 if scales is not None else None,
        )
        r = measure(fn, state.g_params, det_vars, images, z, args.scan)
        results[f"fullstack_{mode}"] = round(r, 1)
        print(json.dumps({f"fullstack_{mode}": results[f"fullstack_{mode}"]}),
              flush=True)

    print(json.dumps({
        "batch": args.batch, "scan": args.scan,
        "input_size": args.input_size,
        "detector_size": args.detector_size, "tta": args.tta,
        "imgs_per_sec": results,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

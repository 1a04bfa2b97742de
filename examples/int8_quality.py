"""Int8 PTQ quality bound on a trained generator.

Calibrates the int8 synthesis graph on real data, then reports PSNR of
the int8 output against the bf16 output AND both against the frontal
ground truth — the documented quality bound for the int8 serving path
(docs/BENCHMARKS.md).

Usage::

    python examples/int8_quality.py --checkpoint /root/runs/gan/ck \
        --img-list /root/data_synth/gan/img.list [--calib-batches 4]
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--img-list", required=True)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--eval-batches", type=int, default=8)
    ap.add_argument("--set", action="append", default=[],
                    help="config overrides, e.g. G.upsample_mode=resize_conv")
    ap.add_argument("--rescale-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="int8 dequantize-epilogue dtype (ops/quant)")
    ap.add_argument("--min-channels", type=int, default=0,
                    help="selective quantization threshold (ops/quant)")
    args = ap.parse_args()

    from tpgan_tpu.config import flat_override, make_config
    from tpgan_tpu.data.multipie import TrainDataset
    from tpgan_tpu.data.pipeline import batch_iterator
    from tpgan_tpu.evaluate import psnr, ssim
    from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn
    from tpgan_tpu.train.checkpoint import restore_gan_checkpoint
    from tpgan_tpu.train.gan_trainer import (
        create_gan_state,
        eval_g_params,
        make_synthesize_fn,
    )

    cfg = make_config({"compute_dtype": "bfloat16"})
    if args.set:
        cfg = flat_override(cfg, args.set)
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    state = restore_gan_checkpoint(args.checkpoint, state)
    state = state.replace(g_params=eval_g_params(state))

    with open(args.img_list) as f:
        ds = TrainDataset([l.strip() for l in f if l.strip()])

    it = batch_iterator(ds, args.batch_size, shuffle=False, epochs=None)
    calib = [next(it) for _ in range(args.calib_batches)]
    scales = calibrate_synthesis(cfg, gen, state.g_params, calib)

    rdt = jnp.bfloat16 if args.rescale_dtype == "bfloat16" else jnp.float32
    f32_fn = jax.jit(make_synthesize_fn(cfg, gen))
    i8_fn = jax.jit(make_int8_synthesize_fn(
        cfg, gen, scales, rescale_dtype=rdt, min_channels=args.min_channels
    ))

    rows = []
    rng = jax.random.PRNGKey(0)
    for _ in range(args.eval_batches):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        rng, zr = jax.random.split(rng)
        z = jax.random.normal(zr, (batch["img"].shape[0], cfg.G.zdim))
        bf16_out = f32_fn(state.g_params, batch, z)
        i8_out = i8_fn(state.g_params, batch, z)
        gt = batch["img_frontal"]
        rows.append(
            {
                "psnr_int8_vs_bf16": float(psnr(i8_out, bf16_out)),
                "ssim_int8_vs_bf16": float(ssim(i8_out, bf16_out)),
                "psnr_bf16_vs_gt": float(psnr(bf16_out, gt)),
                "psnr_int8_vs_gt": float(psnr(i8_out, gt)),
            }
        )
    out = {k: round(float(np.mean([r[k] for r in rows])), 3) for k in rows[0]}
    out["delta_psnr_vs_gt"] = round(
        out["psnr_int8_vs_gt"] - out["psnr_bf16_vs_gt"], 3
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

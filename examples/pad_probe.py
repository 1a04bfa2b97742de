"""On-chip A/B: channel padding on the int8+subpixel serving headline.

Round 2 measured ``G.pad_channel_multiple=128`` on the bf16 DILATED
graph and it lost 15% (the pad work outweighed the tile-alignment win
at bf16 MXU rate). The serving headline graph has since changed twice —
int8 MXU rate (2x, so wasted tiles are relatively cheaper to remove)
and the subpixel algorithm (ops/blocks._subpixel_plan rearranges the
deconv weights to C_out*r^2 output channels, changing which dims are
misaligned). The 75/203/206/208-channel dims still waste up to 40% of
each 128-lane tile; this probe re-asks the round-2 question on the
graphs that now matter.

Methodology = bench.py's sequential scan (same batch, same calibration,
directly comparable with the bench headline and
artifacts/subpixel_probe_r4.json). Padding is exact (zero channels),
so this is a pure-throughput question; no quality arm needed.

Usage: python examples/pad_probe.py [--batch 256] [--scan 20]
       [--multiples 64,128]
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp

import bench  # reuse the bench batch + cache configuration
from tpgan_tpu.config import make_config
from tpgan_tpu.ops.quant import calibrate_synthesis, make_int8_synthesize_fn
from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn
from examples.subpixel_probe import measure


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--multiples", default="64,128",
                    help="comma list of pad multiples to try next to the "
                         "unpadded control")
    ap.add_argument("--fm", type=float, default=1.0,
                    help="G.fm_multiplier (reduce for a CPU smoke run)")
    args = ap.parse_args()

    multiples = [None] + [int(m) for m in args.multiples.split(",") if m]
    results = {}
    for mult in multiples:
        tag = "nopad" if mult is None else f"pad{mult}"
        cfg = make_config({
            "compute_dtype": "bfloat16",
            "G": {"upsample_mode": "subpixel",
                  "fm_multiplier": args.fm,
                  "pad_channel_multiple": mult},
        })
        state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))

        r = measure(
            make_synthesize_fn(cfg, gen), state.g_params,
            args.batch, args.scan,
        )
        results[f"bf16_subpixel_{tag}"] = round(r, 1)
        print(json.dumps({f"bf16_subpixel_{tag}": results[f"bf16_subpixel_{tag}"]}),
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
        results[f"int8_subpixel_{tag}"] = round(r, 1)
        print(json.dumps({f"int8_subpixel_{tag}": results[f"int8_subpixel_{tag}"]}),
              flush=True)

    base = results.get("int8_subpixel_nopad") or 1.0
    print(json.dumps({
        "batch": args.batch, "scan": args.scan,
        "imgs_per_sec": results,
        "int8_speedups_vs_nopad": {
            f"pad{m}": round(results[f"int8_subpixel_pad{m}"] / base, 3)
            for m in multiples if m is not None
        },
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

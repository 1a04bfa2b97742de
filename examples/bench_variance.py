"""Bench variance study (round-1 weakness: 708-946 imgs/s session spread
reported as a max with no distribution).

Runs the b=256 bf16 synthesis bench N times in one session, prints every
sample plus median/min/max and the device description, so BENCH numbers
can be reported as a distribution instead of a single best case.

Usage: python examples/bench_variance.py [--n 5]
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys

import argparse
import json

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--mode", default="bf16")
    args = ap.parse_args()

    import jax

    from bench import bench_ours

    dev = jax.devices()[0]
    samples = []
    for i in range(args.n):
        rate = bench_ours(batch_sizes=(256,), repeats=3, mode=args.mode)
        samples.append(round(rate, 1))
        print(json.dumps({"sample": i, "imgs_per_sec": samples[-1]}))
    print(
        json.dumps(
            {
                "mode": args.mode,
                "samples": samples,
                "median": round(float(np.median(samples)), 1),
                "min": min(samples),
                "max": max(samples),
                "spread_pct": round(
                    100 * (max(samples) - min(samples)) / np.median(samples), 1
                ),
                "device": str(dev),
                "platform": getattr(dev, "platform", "?"),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

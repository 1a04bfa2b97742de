"""A/B: Pallas fused conv3x3+bias+LeakyReLU vs XLA's conv + fused epilogue.

Times both formulations on the chip with the scan-bracket methodology
(bench.py) at representative synthesis-graph shapes. Records the basis
for keeping convs on XLA (or wiring the kernel in, if it wins) —
docs/BENCHMARKS.md "Pallas conv epilogue A/B".

Usage: python examples/pallas_conv_ab.py
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
del _os, _sys

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.ops.pallas_kernels import (
    conv3x3_bias_lrelu_pallas,
    conv3x3_bias_lrelu_xla,
)

SHAPES = [
    # (batch, H, W, Cin, Cout) — the 128x128 head area where epilogue
    # fusion matters most, plus a mid-resolution block
    (8, 128, 128, 64, 64),
    (8, 64, 64, 128, 128),
    (32, 32, 32, 256, 256),
]


def bench(fn, x, w, b, scan_len=16, repeats=3) -> float:
    @jax.jit
    def scan_bench(x, w, b):
        def body(carry, _):
            acc, xx = carry
            y = fn(xx, w, b, 0.2)
            s = jnp.sum(y.astype(jnp.float32))
            return (acc + s, xx + (s * 1e-12).astype(xx.dtype)), None

        (acc, _), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), x), None, length=scan_len
        )
        return acc

    float(scan_bench(x, w, b))  # compile + warm
    dt = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(scan_bench(x, w, b))
        dt = min(dt, time.perf_counter() - t0)
    return scan_len / dt  # convs per second


def main() -> int:
    for batch, h, w, cin, cout in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(batch, h, w, cin).astype(np.float32)).astype(
            jnp.bfloat16
        )
        k = jnp.asarray(
            (rng.randn(3, 3, cin, cout) * 0.05).astype(np.float32)
        ).astype(jnp.bfloat16)
        b = jnp.asarray(rng.randn(cout).astype(np.float32)).astype(jnp.bfloat16)

        xla_rate = bench(conv3x3_bias_lrelu_xla, x, k, b)
        try:
            pallas_rate = bench(conv3x3_bias_lrelu_pallas, x, k, b)
        except Exception as e:
            pallas_rate = None
            err = repr(e)[:120]
        out = {
            "shape": [batch, h, w, cin, cout],
            "xla_convs_per_s": round(xla_rate, 1),
            "pallas_convs_per_s": round(pallas_rate, 1) if pallas_rate else None,
        }
        if pallas_rate:
            out["pallas_vs_xla"] = round(pallas_rate / xla_rate, 3)
        else:
            out["pallas_error"] = err
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

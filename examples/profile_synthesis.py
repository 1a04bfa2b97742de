"""Op-level time breakdown of the synthesis graph (bf16 vs int8) via
jax.profiler + the offline xprof/tensorboard-plugin-profile converters —
the evidence tool for "what owns the int8 gap to peak" (VERDICT r3
item 3: int8 at 55% of int8 peak vs bf16's 82%).

Captures a trace of N timed iterations per mode, converts the xplane to
the op_profile/framework_op_stats tools, and prints the top-k self-time
ops as JSON. Degrades gracefully if the tunneled backend can't trace
device activity (prints whatever planes exist).

Usage: python examples/profile_synthesis.py [--mode int8] [--batch 256]
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp

import bench
from tpgan_tpu.config import make_config
from tpgan_tpu.train.gan_trainer import create_gan_state, make_synthesize_fn


def build_fn(mode: str, cfg, gen, state):
    if mode.startswith("int8"):
        from tpgan_tpu.ops.quant import (
            calibrate_synthesis,
            make_int8_synthesize_fn,
        )

        scales = calibrate_synthesis(
            cfg, gen, state.g_params, [jax.device_get(bench._bench_batch(16))]
        )
        kw = {}
        if mode == "int8_bf16rescale":
            kw = dict(rescale_dtype=jnp.bfloat16)
        return jax.jit(make_int8_synthesize_fn(cfg, gen, scales, **kw))
    return jax.jit(make_synthesize_fn(cfg, gen))


def op_breakdown(logdir: str, top_k: int = 25):
    """Parse the captured xplane into per-op self times. Tries the
    framework_op_stats converter first, falls back to raw xplane plane
    listing so SOMETHING useful always comes back."""
    paths = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        return {"error": "no xplane captured"}
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            paths, "framework_op_stats", {"tqx": "out:json;"}
        )
        table = json.loads(data) if isinstance(data, (str, bytes)) else data
        rows = table.get("table", {}).get("rows", [])
        cols = [c.get("label", c.get("id", "")) for c in
                table.get("table", {}).get("cols", [])]
        out = []
        for r in rows[:top_k]:
            vals = [c.get("v") for c in r.get("c", [])]
            out.append(dict(zip(cols, vals)))
        return {"framework_op_stats_top": out}
    except Exception as e:  # fall back to plane names
        try:
            from xprof.protobuf import xplane_pb2  # type: ignore
        except Exception:
            try:
                from tensorboard_plugin_profile.protobuf import xplane_pb2
            except Exception as e2:
                return {"error": f"convert failed: {e!r}; no xplane proto: {e2!r}"}
        space = xplane_pb2.XSpace()
        space.ParseFromString(open(paths[0], "rb").read())
        return {
            "convert_error": repr(e),
            "planes": [p.name for p in space.planes],
        }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="int8",
                    choices=["bf16", "int8", "int8_bf16rescale"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--logdir", default="/tmp/tpgan_profile")
    ap.add_argument("--top-k", type=int, default=25)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = make_config({"compute_dtype": "bfloat16"})
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(0))
    fn = build_fn(args.mode, cfg, gen, state)
    batch = bench._bench_batch(args.batch)
    z = jnp.zeros((args.batch, 64), jnp.float32)
    fn(state.g_params, batch, z).block_until_ready()  # compile + warm

    logdir = os.path.join(args.logdir, args.mode)
    with jax.profiler.trace(logdir):
        for _ in range(args.iters):
            fn(state.g_params, batch, z).block_until_ready()

    out = {"mode": args.mode, "batch": args.batch,
           "breakdown": op_breakdown(logdir, args.top_k)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

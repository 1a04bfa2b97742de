"""Quick probe: does synthesis throughput keep rising past the bench's
b=256 sweep point? Runs the flagship bf16 (and optionally int8)
synthesis graph at batch 512 with the same dependent-scan methodology
as bench.py and prints one JSON line per mode.

Inference has no critic/GP intermediates, so b=512 may fit the 16 GB
HBM even though training caps at b=128 (docs/BENCHMARKS.md). If it
wins, bench.py's batch_sizes sweep should gain 512.
"""

import json
import os
import sys

import jax

# bench.py lives at the repo root, one level up from examples/ —
# running `python examples/batch512_probe.py` puts examples/ (not the
# root) on sys.path, so add the root explicitly
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import bench_ours

    for mode in ("bf16", "int8"):
        try:
            rate = bench_ours(batch_sizes=(512,), mode=mode)
        except Exception as e:  # OOM is an expected, reportable outcome
            print(json.dumps({"mode": mode, "batch": 512, "error": repr(e)[:200]}))
            continue
        print(json.dumps({"mode": mode, "batch": 512, "imgs_per_sec": rate}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

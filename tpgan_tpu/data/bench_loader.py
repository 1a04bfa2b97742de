"""Host input-pipeline benchmark: can the loader feed the chip?

The train step consumes ``batch_size`` items/step (15 tensors each); the
loader must sustain more imgs/s than the step burns or the chip starves.
This tool measures the three input paths on a real corpus:

* ``files``  — TrainDataset: 15 PIL decodes per item (the reference's
  access pattern, DataAndDataset.py:206-215);
* ``packed`` — PackedDataset: memory-mapped uint8 shards, no decode
  (data/packing.py), uint8 -> [-1, 1] via the native C++ kernel;
* ``packed+prefetch`` — the same through ``prefetch_to_device`` staging
  into HBM (what ``cli train --packed`` runs).

Usage::

    python -m tpgan_tpu.data.bench_loader --img-list .../img.list \
        --packed .../packed --batch-size 128 --batches 20

Prints one JSON line per path: {"path", "imgs_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import time


def bench_iterator(it, batch_size: int, batches: int, warmup: int = 2):
    """Pull ``batches`` batches, timing after ``warmup``. Returns imgs/s."""
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    n = 0
    for _ in range(batches):
        b = next(it)
        # touch the data so lazy paths can't cheat
        leaf = b["img"] if isinstance(b, dict) else b[0]
        float(leaf.reshape(-1)[0]) if hasattr(leaf, "reshape") else None
        n += batch_size
    dt = time.perf_counter() - t0
    return n / dt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img-list", default=None)
    ap.add_argument("--packed", default=None)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--num-workers", type=int, default=4)
    args = ap.parse_args(argv)

    from tpgan_tpu.data.pipeline import batch_iterator, prefetch_to_device

    results = []
    if args.img_list:
        from tpgan_tpu.data.multipie import TrainDataset

        with open(args.img_list) as f:
            ds = TrainDataset([l.strip() for l in f if l.strip()])
        it = batch_iterator(
            ds, args.batch_size, shuffle=True, epochs=None,
            num_workers=args.num_workers,
        )
        rate = bench_iterator(it, args.batch_size, args.batches)
        results.append({"path": "files", "imgs_per_sec": round(rate, 1)})

    if args.packed:
        from tpgan_tpu.data.packing import PackedDataset

        ds = PackedDataset(args.packed)
        it = batch_iterator(
            ds, args.batch_size, shuffle=True, epochs=None,
            num_workers=args.num_workers,
        )
        rate = bench_iterator(it, args.batch_size, args.batches)
        results.append({"path": "packed", "imgs_per_sec": round(rate, 1)})

        it = prefetch_to_device(
            batch_iterator(
                ds, args.batch_size, shuffle=True, epochs=None,
                num_workers=args.num_workers,
            ),
            size=2,
        )
        rate = bench_iterator(it, args.batch_size, args.batches)
        results.append(
            {"path": "packed+prefetch", "imgs_per_sec": round(rate, 1)}
        )

    for r in results:
        r["batch_size"] = args.batch_size
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

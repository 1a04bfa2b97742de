"""Soft-decode hyperparameter sweep for anchor_offset detectors.

The mass-cluster decode (losses/decoder.soft_decode_landmarks) has two
knobs — ``candidates`` (how many top-scored anchors enter the vote) and
``cluster_radius`` (the neighbourhood that defines one mode). This
script separates the EXPENSIVE part (one backbone forward over the val
split per checkpoint) from the CHEAP part (re-decoding the cached
loc/cls under every knob setting), so a full grid over several saved
checkpoints costs one forward each.

Selection metric = the same banded accuracy the pretrain driver tracks
(Pretrain.py:29-32 bands), plus within_5px and the nose catastrophic
tail. Picks the best (checkpoint, radius, candidates) triple.

Usage::

    python examples/decode_sweep.py --ckpt-root runs/pretrain_anchor3/ckpt \
        --out artifacts/decode_sweep_r4.json
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.data.celeba import CelebALandmarkDataset
from tpgan_tpu.data.pipeline import bucketed_batch_iterator
from tpgan_tpu.losses.decoder import soft_decode_landmarks
from tpgan_tpu.train.checkpoint import restore_checkpoint
from tpgan_tpu.train.pretrain import (
    apply_detector_meta,
    create_pretrain_state,
)
from examples.detector_error_analysis import PARTS, band_weight


def collect_raw(
    ckpt: str, data_root: str, buckets, val_ratio, batch_size, step=None
):
    """One forward pass over the val split -> host (loc, cls, gt) lists.
    ``ckpt`` is an Orbax root (step dirs inside); ``step`` picks one."""
    cfg = make_config({"pretrain": {
        "data_root_dir": data_root,
        "image_buckets": buckets,
        "validation_data_ratio": val_ratio,
    }})
    p = cfg.pretrain
    ds = CelebALandmarkDataset(
        p.txt_name, p.data_root_dir, p.image_size, buckets=p.image_buckets
    )
    _, val_idx, _ = ds.split(p.train_data_ratio, p.validation_data_ratio)
    cfg = apply_detector_meta(cfg, ckpt)
    state, model, _tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = restore_checkpoint(ckpt, state, step=step)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(images):
        return model.apply(variables, images, train=False)

    locs, clss, gts = [], [], []
    for images, labels in bucketed_batch_iterator(
        ds, batch_size, shuffle=False, indices=val_idx, epochs=1,
        drop_last=False,
    ):
        loc, cls = forward(jnp.asarray(images))
        locs.append(np.asarray(loc))
        clss.append(np.asarray(cls))
        gts.append(np.asarray(labels).reshape(-1, 4, 2))
    return locs, clss, gts


def score(locs, clss, gts, radius: float, candidates: int):
    decode = jax.jit(lambda l, c: soft_decode_landmarks(
        l, c, confidence_threshold=0.0,
        candidates=candidates, cluster_radius=radius,
    ).points[:, :4, 0, :])
    errs = {part: [] for part in PARTS}
    for loc, cls, gt in zip(locs, clss, gts):
        pts = np.asarray(decode(loc, cls))
        d = np.linalg.norm(pts - gt, axis=-1)
        for i, part in enumerate(PARTS):
            errs[part].extend(d[:, i].tolist())
    per_part, ws = {}, []
    for part in PARTS:
        e = np.asarray(errs[part])
        w = band_weight(e)
        ws.append(w)
        per_part[part] = {
            "mean_px": round(float(e.mean()), 2),
            "banded_acc": round(float(w.mean()), 4),
            "within_5px": round(float((e <= 5).mean()), 4),
            "over_45px": round(float((e > 45).mean()), 4),
        }
    all_e = np.concatenate([np.asarray(errs[p]) for p in PARTS])
    return {
        "banded_accuracy": round(float(np.mean(np.stack(ws))), 4),
        "within_5px": round(float((all_e <= 5).mean()), 4),
        "per_part": per_part,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-root", default="runs/pretrain_anchor3/ckpt")
    ap.add_argument("--data-root", default="data_synth/pretrain")
    ap.add_argument("--buckets", default="256,320")
    ap.add_argument("--val-ratio", type=float, default=0.02)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--radii", default="10,15,20,30,40")
    ap.add_argument("--candidates", default="16,32,64,128")
    ap.add_argument("--out", default="artifacts/decode_sweep_r4.json")
    args = ap.parse_args()
    buckets = tuple(int(b) for b in args.buckets.split(","))

    # step dirs live directly under the root; "best" is its own Orbax
    # root (the pretrain driver mirrors the best-so-far step into it)
    targets = [
        (args.ckpt_root, int(d))
        for d in sorted(os.listdir(args.ckpt_root)) if d.isdigit()
    ]
    if os.path.isdir(os.path.join(args.ckpt_root, "best")):
        targets.append((os.path.join(args.ckpt_root, "best"), None))
    results = {}
    best = None
    for root, step in targets:
        name = f"best" if step is None else str(step)
        locs, clss, gts = collect_raw(
            root, args.data_root, buckets, args.val_ratio, args.batch_size,
            step=step,
        )
        for radius in (float(r) for r in args.radii.split(",")):
            for cand in (int(c) for c in args.candidates.split(",")):
                s = score(locs, clss, gts, radius, cand)
                key = f"{name}/r{radius:g}/c{cand}"
                results[key] = s
                print(key, s["banded_accuracy"], s["within_5px"],
                      flush=True)
                if best is None or (
                    s["banded_accuracy"] > results[best]["banded_accuracy"]
                ):
                    best = key
    out = {"best": best, "best_result": results[best], "grid": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("BEST", best, json.dumps(results[best]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

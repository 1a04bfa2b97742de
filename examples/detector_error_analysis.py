"""Per-part landmark-detector error analysis on the validation split —
documents WHERE the banded-accuracy ceiling comes from (VERDICT r2
item 5: "target >0.8 val banded accuracy or document the ceiling").

Runs the trained detector over the same validation indices the pretrain
driver used (same split seed), decodes with the serving decoder
(losses/decoder.decode_landmarks, confidence 0 / top-1), and reports the
per-part pixel-error distribution plus the banded accuracy each part
contributes (bands: Pretrain.py:29-32).

Usage::

    python examples/detector_error_analysis.py \
        --checkpoint runs/pretrain/ckpt/best \
        --data-root data_synth/pretrain --buckets 256,320
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.data.celeba import CelebALandmarkDataset
from tpgan_tpu.data.pipeline import bucketed_batch_iterator
from tpgan_tpu.losses.decoder import decode_for_head_mode
from tpgan_tpu.train.checkpoint import restore_checkpoint
from tpgan_tpu.train.pretrain import (
    ACC_THRESHOLDS,
    ACC_WEIGHTS,
    apply_detector_meta,
    create_pretrain_state,
)

PARTS = ("left_eye", "right_eye", "nose", "mouth")


def band_weight(dists: np.ndarray) -> np.ndarray:
    w = np.zeros_like(dists)
    for t, wt in sorted(zip(ACC_THRESHOLDS, ACC_WEIGHTS)):
        w = np.where((w == 0) & (dists <= t), wt, w)
    return w


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-root", default="data_synth/pretrain")
    ap.add_argument("--buckets", default="256,320")
    ap.add_argument("--val-ratio", type=float, default=0.02)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--tta", action="store_true",
                    help="measure through the serving detect_lm5 path "
                         "with horizontal-mirror TTA (letterboxed to "
                         "--detector-size)")
    ap.add_argument("--serving", action="store_true",
                    help="measure through detect_lm5 WITHOUT TTA — the "
                         "apples-to-apples control for --tta (letterbox "
                         "rescale included either way)")
    ap.add_argument("--detector-size", type=int, default=256)
    ap.add_argument("--refine", action="store_true",
                    help="add the second-stage zoom-crop refinement "
                         "(frontalize.refine_lm5) on top of --serving/"
                         "--tta")
    ap.add_argument("--no-nose-gate", action="store_true",
                    help="disable the shape-prior nose plausibility "
                         "gate (the ungated control arm)")
    ap.add_argument("--dump-points", default=None,
                    help="write per-image decoded points + gt to this "
                         ".npz for offline decode-knob sweeps")
    args = ap.parse_args()

    buckets = tuple(int(b) for b in args.buckets.split(","))
    cfg = make_config({"pretrain": {
        "data_root_dir": args.data_root,
        "image_buckets": buckets,
        "validation_data_ratio": args.val_ratio,
    }})
    p = cfg.pretrain
    ds = CelebALandmarkDataset(
        p.txt_name, p.data_root_dir, p.image_size, buckets=p.image_buckets
    )
    _, val_idx, _ = ds.split(p.train_data_ratio, p.validation_data_ratio)

    cfg = apply_detector_meta(cfg, args.checkpoint)
    state, model, _tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = restore_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.tta or args.serving:
        from tpgan_tpu.frontalize import detect_lm5
        from tpgan_tpu.train.pretrain import load_nose_prior

        nose_prior = (
            None if args.no_nose_gate else load_nose_prior(args.checkpoint)
        )

        @jax.jit
        def detect(images):
            lm5, _valid, scores = detect_lm5(
                model, variables, images,
                detector_size=args.detector_size, tta=args.tta,
                refine=args.refine, nose_prior=nose_prior,
            )
            return lm5[:, :4, :], scores
    else:
        @jax.jit
        def detect(images):
            loc, cls = model.apply(variables, images, train=False)
            d = decode_for_head_mode(model.head_mode, 0.0)(loc, cls)
            return d.points[:, :4, 0, :], d.scores[:, :4, 0]

    errs = {part: [] for part in PARTS}
    confs = {part: [] for part in PARTS}
    all_pts, all_gt = [], []
    for images, labels in bucketed_batch_iterator(
        ds, args.batch_size, shuffle=False, indices=val_idx, epochs=1,
        drop_last=False,
    ):
        pts, scores = detect(jnp.asarray(images))
        pts = np.asarray(pts)
        scores = np.asarray(scores)
        gt = np.asarray(labels).reshape(-1, 4, 2)
        d = np.linalg.norm(pts - gt, axis=-1)  # (B, 4)
        for i, part in enumerate(PARTS):
            errs[part].extend(d[:, i].tolist())
            confs[part].extend(scores[:, i].tolist())
        all_pts.append(pts)
        all_gt.append(gt)

    if args.dump_points:
        # raw per-image decodes + ground truth: offline decode-knob
        # sweeps (e.g. the nose-gate ratio) without re-running the model
        np.savez(args.dump_points,
                 pts=np.concatenate(all_pts), gt=np.concatenate(all_gt))

    out = {"n": len(next(iter(errs.values()))), "bands": {}}
    total_w = []
    for part in PARTS:
        e = np.asarray(errs[part])
        w = band_weight(e)
        total_w.append(w)
        out["bands"][part] = {
            "mean_px": round(float(e.mean()), 2),
            "median_px": round(float(np.median(e)), 2),
            "p90_px": round(float(np.percentile(e, 90)), 2),
            "banded_acc": round(float(w.mean()), 4),
            "within_5px": round(float((e <= 5).mean()), 4),
            "over_45px": round(float((e > 45).mean()), 4),
            "mean_conf": round(float(np.mean(confs[part])), 3),
        }
    out["banded_accuracy"] = round(float(np.mean(np.stack(total_w))), 4)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

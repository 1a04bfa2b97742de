"""Serving-frame detector error on the ACTUAL eval probes (128 px).

Round-4 finding: the anchor-offset detector improved native-frame val
banded accuracy 0.737 -> 0.897, yet the full-stack eval stayed ~2.6 dB
below the GT-landmark ceiling (artifacts/eval_heldout_fullstack_r4.json
vs eval_heldout_gt_r4.json) — same as the WORSE baseline detector.

Hypothesis: the serving path, not the detector. ``cli eval
--detector-checkpoint`` feeds 128x128 probes into ``detect_lm5``, which
letterboxed with ``allow_upscale=False``: the face occupies a quarter of
the 256 detector frame (training faces fill 160-320 px — data_synth
pretrain render sizes), and detector-frame error maps back into the
source frame DIVIDED BY scale=1 instead of the 2x an upscale would give.

This probe measures detector error in the 128 source frame on the real
eval probes — ground truth from the analytic synthetic-face landmarks
(data/synthetic_faces.render_face, the same renderer that produced the
corpus) — across serving configurations:

  * native:      allow_upscale=False (the round-4 chain2 eval behavior)
  * upscale:     allow_upscale=True, detector_size 256
  * upscale+tta: + horizontal-mirror TTA
  * upscale320:  allow_upscale=True, detector_size 320

Usage::

    python examples/serving_scale_probe.py \
        --checkpoint runs/pretrain_anchor3/ckpt \
        --img-list data_synth/eval/img.list
"""

from __future__ import annotations

# repo-root import when run as `python examples/<script>.py`
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import re

import numpy as np
from PIL import Image

import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.frontalize import detect_lm5
from tpgan_tpu.data.synthetic_faces import ALL_CAMERA_YAWS, render_face
from tpgan_tpu.train.checkpoint import restore_checkpoint
from tpgan_tpu.train.pretrain import (
    apply_detector_meta,
    create_pretrain_state,
)

PARTS = ("left_eye", "right_eye", "nose", "mouth")


def gt_lm4_for(path: str, render_size: int, out_size: int) -> np.ndarray:
    """Analytic (4, 2) ground truth in the out_size frame: eyes, nose,
    mouth midpoint — the detector's class order (CelebA label order,
    reference DataAndDataset.py:142-143)."""
    m = re.match(r"(\d+)_\d+_(\d+)_\d+", os.path.basename(path))
    subject, cam = int(m.group(1)), m.group(2)
    _, lm5 = render_face(subject, ALL_CAMERA_YAWS[cam], render_size)
    lm5 = np.asarray(lm5, np.float32) * (out_size / render_size)
    mouth_mid = (lm5[3] + lm5[4]) / 2.0
    return np.stack([lm5[0], lm5[1], lm5[2], mouth_mid])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--img-list", default="data_synth/eval/img.list")
    ap.add_argument("--render-size", type=int, default=144,
                    help="size generate_gan_protocol rendered raw/ at")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    with open(args.img_list) as f:
        paths = [line.strip() for line in f if line.strip()]
    if args.limit:
        paths = paths[: args.limit]

    imgs = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in paths])
    gts = np.stack(
        [gt_lm4_for(p, args.render_size, imgs.shape[1]) for p in paths]
    )

    cfg = make_config()
    cfg = apply_detector_meta(cfg, args.checkpoint)
    state, model, _tx = create_pretrain_state(cfg, __import__("jax").random.PRNGKey(0))
    state = restore_checkpoint(args.checkpoint, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    modes = {
        "native": dict(detector_size=256, allow_upscale=False),
        "upscale": dict(detector_size=256, allow_upscale=True),
        "upscale_tta": dict(detector_size=256, allow_upscale=True, tta=True),
        "upscale320": dict(detector_size=320, allow_upscale=True),
    }

    import jax

    out = {"checkpoint": args.checkpoint, "n": len(paths),
           "probe_size": int(imgs.shape[1]), "modes": {}}
    for name, kw in modes.items():
        fn = jax.jit(lambda im, kw=kw: detect_lm5(model, variables, im, **kw))
        preds = []
        for i in range(0, len(imgs), args.batch_size):
            lm5, _valid, _scores = fn(jnp.asarray(imgs[i : i + args.batch_size]))
            preds.append(np.asarray(lm5)[:, :4, :])
        pred = np.concatenate(preds)
        err = np.sqrt(np.sum((pred - gts) ** 2, axis=-1))  # (N, 4)
        mode_stats = {
            "mean_px": float(err.mean()),
            "median_px": float(np.median(err)),
            "p90_px": float(np.percentile(err, 90)),
            "within_3px": float((err <= 3).mean()),
            "within_5px": float((err <= 5).mean()),
            "per_part": {
                p: {"mean_px": float(err[:, i].mean()),
                    "p90_px": float(np.percentile(err[:, i], 90))}
                for i, p in enumerate(PARTS)
            },
        }
        out["modes"][name] = mode_stats
        print(json.dumps({name: {k: mode_stats[k] for k in
                                 ("mean_px", "median_px", "within_5px")}}),
              flush=True, file=_sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

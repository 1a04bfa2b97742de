"""Per-bucket validation accuracy for a multi-bucket pretrain run.

Closes the round-2 verdict's 1024-bucket gap: the reference's config
intent is landmark pretraining on images up to ``image_max_size=1024``
(reference config.py:40, collate filter Pretrain.py:66-74); the round-2
campaign only exercised buckets (256, 320). This script scores a trained
detector's banded accuracy separately for each size bucket so parity
across buckets is a measured number, not an assumption.

Usage:
    python examples/bucket_parity_eval.py \
        --checkpoint runs/pretrain1024/ckpt/best \
        --data-root data_synth/pretrain1024 \
        --buckets 256,512,1024 [--batch-size 16]
"""
import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

# repo root on sys.path: `python examples/...` puts examples/ there
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--buckets", default="256,512,1024")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--train-ratio", type=float, default=0.85)
    ap.add_argument("--validation-ratio", type=float, default=0.1)
    args = ap.parse_args()

    from tpgan_tpu.config import make_config
    from tpgan_tpu.data.celeba import CelebALandmarkDataset
    from tpgan_tpu.data.pipeline import bucketed_batch_iterator
    from tpgan_tpu.train.checkpoint import restore_checkpoint
    from tpgan_tpu.train.pretrain import create_pretrain_state

    buckets = tuple(int(b) for b in args.buckets.split(","))
    cfg = make_config({
        "pretrain": {
            "data_root_dir": args.data_root,
            "image_buckets": buckets,
            "batch_size": args.batch_size,
            "train_data_ratio": args.train_ratio,
            "validation_data_ratio": args.validation_ratio,
        }
    })
    p = cfg.pretrain
    ds = CelebALandmarkDataset(
        p.txt_name, p.data_root_dir, p.image_size, buckets=p.image_buckets
    )
    _, val_idx, _ = ds.split(p.train_data_ratio, p.validation_data_ratio)

    from tpgan_tpu.losses.decoder import decode_landmarks
    from tpgan_tpu.train.pretrain import landmark_accuracy

    state, model, _ = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = restore_checkpoint(args.checkpoint, state)
    model_eval = model.clone(accum_f32=True)

    @jax.jit
    def decode_step(st, images):
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        loc, cls = model_eval.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            images, train=False,
        )
        d = decode_landmarks(loc, cls)
        return d.points, d.valid

    min_bucket = min(buckets)
    per_bucket: dict = {}
    it = bucketed_batch_iterator(
        ds, p.batch_size, shuffle=False, indices=val_idx, epochs=1,
        drop_last=False,
    )
    for images, labels in it:
        size = int(np.asarray(images).shape[1])
        points, valid = decode_step(state, jnp.asarray(images))
        labels_j = jnp.asarray(labels)
        acc = float(landmark_accuracy(points, valid, labels_j))
        # relative-error variant: bands scaled by bucket/min_bucket so a
        # 1024 px source is judged at the same FRACTION of image size as
        # a 256 px one (the reference's absolute bands, Pretrain.py:31-32,
        # are intrinsically ~4x stricter at 1024)
        acc_rel = float(landmark_accuracy(
            points, valid, labels_j, thresholds_scale=size / min_bucket
        ))
        rec = per_bucket.setdefault(size, {"acc": [], "acc_rel": [], "n": 0})
        rec["acc"].append(acc * len(images))
        rec["acc_rel"].append(acc_rel * len(images))
        rec["n"] += len(images)

    out = {
        "checkpoint": args.checkpoint,
        "buckets": {
            str(size): {
                "val_accuracy": round(sum(rec["acc"]) / rec["n"], 4),
                "val_accuracy_scaled_bands": round(
                    sum(rec["acc_rel"]) / rec["n"], 4
                ),
                "num_images": rec["n"],
            }
            for size, rec in sorted(per_bucket.items())
        },
    }
    all_n = sum(r["n"] for r in per_bucket.values())
    out["overall_val_accuracy"] = round(
        sum(sum(r["acc"]) for r in per_bucket.values()) / all_n, 4
    )
    out["overall_val_accuracy_scaled_bands"] = round(
        sum(sum(r["acc_rel"]) for r in per_bucket.values()) / all_n, 4
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

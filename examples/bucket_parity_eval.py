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

import jax
import jax.numpy as jnp
import numpy as np


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
    from tpgan_tpu.train.pretrain import create_pretrain_state, make_eval_step

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

    state, model, _ = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    state = restore_checkpoint(args.checkpoint, state)
    eval_step = jax.jit(make_eval_step(cfg, model))

    rng = jax.random.PRNGKey(1)
    per_bucket: dict = {}
    it = bucketed_batch_iterator(
        ds, p.batch_size, shuffle=False, indices=val_idx, epochs=1,
        drop_last=False,
    )
    for images, labels in it:
        size = int(np.asarray(images).shape[1])
        rng, e_rng = jax.random.split(rng)
        m = eval_step(state, jnp.asarray(images), jnp.asarray(labels), e_rng)
        rec = per_bucket.setdefault(size, {"acc": [], "n": 0})
        rec["acc"].append(float(m["val_accuracy"]) * len(images))
        rec["n"] += len(images)

    out = {
        "checkpoint": args.checkpoint,
        "buckets": {
            str(size): {
                "val_accuracy": round(sum(rec["acc"]) / rec["n"], 4),
                "num_images": rec["n"],
            }
            for size, rec in sorted(per_bucket.items())
        },
    }
    all_acc = sum(sum(r["acc"]) for r in per_bucket.values())
    all_n = sum(r["n"] for r in per_bucket.values())
    out["overall_val_accuracy"] = round(all_acc / all_n, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

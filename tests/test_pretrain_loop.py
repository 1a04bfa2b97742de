"""Integration: the full pretrain driver on synthetic data — a few real
steps with validation, metrics, and checkpointing (BASELINE config 4
pipeline; reference loop Pretrain.py:151-307)."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.train.metrics import MetricWriter, NaNMonitor
from tpgan_tpu.train.pretrain import (
    create_pretrain_state,
    landmark_accuracy,
    make_eval_step,
    make_pretrain_step,
    run_pretrain,
)

SIZE = 64
CFG = make_config(
    {
        "pretrain": {
            "image_size": SIZE,
            "num_epochs": 1,
            "batch_size": 2,
            "log_step_of_batchs": 2,
        }
    }
)


def _batches(n, b=2, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(n):
        yield (
            rng.rand(b, SIZE, SIZE, 3).astype(np.float32),
            rng.rand(b, 8).astype(np.float32) * SIZE,
        )


def test_pretrain_step_updates_and_is_finite():
    state, model, tx = create_pretrain_state(CFG, jax.random.PRNGKey(0))
    step = jax.jit(make_pretrain_step(CFG, model, tx), donate_argnums=0)
    images, labels = next(_batches(1))
    before = np.asarray(state.params["stem"]["kernel"]).copy()
    state, metrics = step(
        state, jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    assert not np.allclose(np.asarray(state.params["stem"]["kernel"]), before)
    # BN running stats moved (train mode)
    assert not np.allclose(
        np.asarray(state.batch_stats["stem_bn"]["mean"]), 0.0
    )


def test_run_pretrain_driver(tmp_path):
    writer = MetricWriter(str(tmp_path / "logs"), use_tensorboard=False)
    state = run_pretrain(
        CFG,
        _batches(4),
        val_batches_fn=lambda: _batches(1, seed=9),
        steps_per_epoch=4,
        writer=writer,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    writer.close()
    assert int(state.step) == 4
    # epoch checkpoint written
    from tpgan_tpu.train.checkpoint import latest_step

    assert latest_step(str(tmp_path / "ckpt")) == 4
    # metrics mirrored to jsonl
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


def test_landmark_accuracy_bands():
    # perfect prediction -> weight 1.0 band
    pts = jnp.zeros((1, 5, 1, 2))
    labels = jnp.zeros((1, 8))
    valid = jnp.ones((1, 5, 1), bool)
    acc = landmark_accuracy(pts, valid, labels)
    np.testing.assert_allclose(float(acc), 1.0)
    # distance 20 falls in the (18, 30] band => 0.35
    pts2 = jnp.full((1, 5, 1, 2), 0.0).at[:, :, :, 0].set(20.0)
    acc2 = landmark_accuracy(pts2, valid, labels)
    np.testing.assert_allclose(float(acc2), 0.35, rtol=1e-6)
    # invalid predictions score zero
    acc3 = landmark_accuracy(pts, jnp.zeros((1, 5, 1), bool), labels)
    np.testing.assert_allclose(float(acc3), 0.0)


def test_nan_monitor():
    import pytest

    m = NaNMonitor()
    m.check(0, {"ok": 1.0})
    with pytest.raises(FloatingPointError):
        m.check(1, {"bad": float("nan")})


def test_run_pretrain_sharded_over_mesh(tmp_path):
    """Data-parallel pretraining over the 8-virtual-device mesh."""
    from tpgan_tpu.config import MeshConfig
    from tpgan_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(MeshConfig(data=8, model=1))
    cfg = make_config(
        {
            "pretrain": {
                "image_size": SIZE,
                "num_epochs": 1,
                "batch_size": 8,
                "log_step_of_batchs": 100,
            }
        }
    )
    state = run_pretrain(
        cfg,
        _batches(2, b=8),
        steps_per_epoch=2,
        mesh=mesh,
    )
    assert int(state.step) == 2


def test_multibucket_pretrain_two_buckets(tmp_path):
    """Multi-bucket pretraining (VERDICT r1 item 7): two source sizes
    route to two buckets, each bucket batch trains through the SAME step
    function (per-shape XLA specialisation), and small images keep
    source-pixel label coordinates (scale == 1, centred zero-pad)."""
    import numpy as np
    from PIL import Image

    from tpgan_tpu.data.celeba import CelebALandmarkDataset
    from tpgan_tpu.data.pipeline import bucketed_batch_iterator

    root = tmp_path / "celeba"
    (root / "img").mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = ["8", "hdr"]
    sizes = [100, 100, 100, 100, 200, 200, 200, 200]
    for i, s in enumerate(sizes):
        arr = (rng.rand(s, s, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "img" / f"{i:06d}.jpg")
        lines.append(f"{i:06d}.jpg 30 40 60 40 45 55 35 70 55 70")
    (root / "list_landmarks_celeba.txt").write_text("\n".join(lines) + "\n")

    ds = CelebALandmarkDataset(
        "list_landmarks_celeba.txt", str(root), buckets=(128, 256)
    )
    assert ds.bucket_for(100, 100) == 128
    assert ds.bucket_for(200, 150) == 256
    assert ds.bucket_for(400, 10) == 256  # larger than all -> largest

    # source-pixel label frame: a 100px image in the 128 bucket is only
    # padded ((128-100)//2 = 14 each side), never scaled
    img, label = ds[0]
    assert img.shape == (128, 128, 3)
    np.testing.assert_allclose(
        label.reshape(4, 2),
        np.asarray([[30, 40], [60, 40], [45, 55], [45, 70]], np.float32)
        + 14.0,
    )

    batches = list(
        bucketed_batch_iterator(ds, 4, shuffle=True, epochs=1, seed=1)
    )
    shapes = sorted(b[0].shape for b in batches)
    assert shapes == [(4, 128, 128, 3), (4, 256, 256, 3)]

    # both buckets step through one train_step (two XLA specialisations)
    cfg = make_config({"pretrain": {"image_size": 128}})
    state, model, tx = create_pretrain_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_pretrain_step(cfg, model, tx))
    for images, labels in batches:
        state, metrics = step(
            state, jnp.asarray(images), jnp.asarray(labels), jax.random.PRNGKey(2)
        )
        assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2


def test_run_pretrain_resume_continues_schedule(tmp_path):
    """resume=True restores the latest epoch checkpoint and continues
    the epoch schedule from there instead of restarting at step 0 — the
    restore half the reference's resume keys promise but never implement
    (config.py:56-57)."""
    cfg2 = make_config(
        {
            "pretrain": {
                "image_size": SIZE,
                "num_epochs": 2,
                "batch_size": 2,
                "log_step_of_batchs": 100,
            }
        }
    )
    ckpt = str(tmp_path / "ckpt")
    # first run: epochs capped at 1 -> stops at step 3
    cfg1 = make_config(
        {
            "pretrain": {
                "image_size": SIZE,
                "num_epochs": 1,
                "batch_size": 2,
                "log_step_of_batchs": 100,
            }
        }
    )
    state = run_pretrain(
        cfg1, _batches(3), steps_per_epoch=3, checkpoint_dir=ckpt
    )
    assert int(state.step) == 3
    # resumed run under the 2-epoch schedule: picks up at epoch 1 and
    # runs exactly the remaining 3 steps
    state = run_pretrain(
        cfg2, _batches(10), steps_per_epoch=3, checkpoint_dir=ckpt,
        resume=True,
    )
    assert int(state.step) == 6
    from tpgan_tpu.train.checkpoint import latest_step

    assert latest_step(ckpt) == 6


def test_run_pretrain_resume_keeps_best_bar(tmp_path):
    """A resumed run must not overwrite ``best/`` with a first-val
    checkpoint that is worse than the historical best: the bar is
    persisted in ``best_acc.json`` (the reference's best tracking is
    broken outright — inverted comparison at Pretrain.py:252 — and has
    no resume at all)."""
    import json

    cfg1 = make_config(
        {
            "pretrain": {
                "image_size": SIZE,
                "num_epochs": 1,
                "batch_size": 2,
                "log_step_of_batchs": 2,
            }
        }
    )
    ckpt = str(tmp_path / "ckpt")
    run_pretrain(
        cfg1,
        _batches(2),
        val_batches_fn=lambda: _batches(1, seed=9),
        steps_per_epoch=2,
        checkpoint_dir=ckpt,
    )
    meta = json.load(open(tmp_path / "ckpt" / "best_acc.json"))
    assert meta["step"] == 2 and 0.0 <= meta["best_acc"] <= 1.0
    # pretend history recorded a far better val than anything a resumed
    # 2-step run can reach; best/ must stay untouched
    json.dump({"best_acc": 2.0, "step": 2},
              open(tmp_path / "ckpt" / "best_acc.json", "w"))
    from tpgan_tpu.train.checkpoint import latest_step

    best_before = latest_step(str(tmp_path / "ckpt" / "best"))
    cfg2 = make_config(
        {
            "pretrain": {
                "image_size": SIZE,
                "num_epochs": 2,
                "batch_size": 2,
                "log_step_of_batchs": 2,
            }
        }
    )
    run_pretrain(
        cfg2,
        _batches(10),
        val_batches_fn=lambda: _batches(1, seed=9),
        steps_per_epoch=2,
        checkpoint_dir=ckpt,
        resume=True,
    )
    assert latest_step(str(tmp_path / "ckpt" / "best")) == best_before
    assert json.load(open(tmp_path / "ckpt" / "best_acc.json"))[
        "best_acc"
    ] == 2.0

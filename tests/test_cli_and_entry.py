"""CLI synthesize end-to-end (random init) and graft-entry tracing."""

import json
import os
import sys

import numpy as np


def test_cli_synthesize_end_to_end(tmp_path):
    from PIL import Image

    from tpgan_tpu import cli

    rng = np.random.RandomState(0)
    img_path = tmp_path / "probe.png"
    Image.fromarray((rng.rand(200, 180, 3) * 255).astype(np.uint8)).save(img_path)
    lm68 = rng.rand(68, 2) * 150 + 10
    lm_path = tmp_path / "lm.txt"
    lm_path.write_text(" ".join(str(float(v)) for v in lm68.reshape(-1)))
    out_path = tmp_path / "out.png"

    rc = cli.main([
        "synthesize",
        "--image", str(img_path),
        "--landmarks", str(lm_path),
        "--output", str(out_path),
        # small model for CPU test speed
        "--set", "G.fm_multiplier=0.25",
        "--set", "G.local_feature_layer_dim=16",
        "--set", "compute_dtype=float32",
    ])
    assert rc == 0
    with Image.open(out_path) as im:
        assert im.size == (128, 128)


def test_config_overrides():
    from tpgan_tpu.config import flat_override, make_config

    cfg = make_config()
    cfg2 = flat_override(cfg, ["G.zdim=128", "train.batch_size=8",
                               "pretrain.model_name=mobilenetv2"])
    assert cfg2.G.zdim == 128
    assert cfg2.train.batch_size == 8
    assert cfg2.pretrain.model_name == "mobilenetv2"
    import pytest

    with pytest.raises(KeyError):
        flat_override(cfg, ["nope.x=1"])


def test_full_size_generator_traces():
    """The full-size flagship graph (what __graft_entry__.entry exposes)
    must trace end-to-end — eval_shape only, no compile, so this stays
    fast on one CPU core."""
    import jax
    import jax.numpy as jnp

    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.gan_trainer import build_models

    cfg = make_config({"compute_dtype": "bfloat16"})
    gen, disc = build_models(cfg)
    b = 8
    args = (
        jnp.zeros((b, 128, 128, 3)),
        jnp.zeros((b, 40, 40, 3)),
        jnp.zeros((b, 40, 40, 3)),
        jnp.zeros((b, 32, 40, 3)),
        jnp.zeros((b, 32, 48, 3)),
        jnp.zeros((b, 64)),
    )
    variables = jax.eval_shape(gen.init, jax.random.PRNGKey(0), *args)
    out = jax.eval_shape(gen.apply, variables, *args)
    assert out.img128_fake.shape == (b, 128, 128, 3)
    assert out.encoder_predict.shape == (b, 347)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(variables["params"])
    )
    assert n_params > 10_000_000  # full-size network, not a stub

    d_vars = jax.eval_shape(disc.init, jax.random.PRNGKey(0), args[0])
    scores = jax.eval_shape(disc.apply, d_vars, args[0])
    assert scores.shape == (b, 4, 4, 1)


def test_cli_pretrain_end_to_end(tmp_path):
    """cmd_pretrain over a synthetic CelebA layout: parses labels, walks
    images, letterboxes, runs jitted steps, checkpoints."""
    from PIL import Image

    from tpgan_tpu import cli

    root = tmp_path / "celeba"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = ["6", "header"]
    for i in range(6):
        arr = (rng.rand(218, 178, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i:06d}.jpg")
        lines.append(f"{i:06d}.jpg 60 100 120 100 90 140 70 170 110 170")
    (root / "list_landmarks_celeba.txt").write_text("\n".join(lines) + "\n")

    rc = cli.main([
        "pretrain",
        "--checkpoint", str(tmp_path / "ck"),
        "--set", f"pretrain.data_root_dir={root}",
        "--set", f"pretrain.log_root_dir={tmp_path / 'logs'}",
        "--set", "pretrain.image_size=64",
        "--set", "pretrain.batch_size=2",
        "--set", "pretrain.num_epochs=1",
        "--set", "pretrain.train_data_ratio=0.84",
        "--set", "pretrain.validation_data_ratio=0.0",
    ])
    assert rc == 0
    from tpgan_tpu.train.checkpoint import latest_step

    assert latest_step(str(tmp_path / "ck")) is not None


def test_cli_synth_data_gan_packed(tmp_path):
    """synth-data CLI: GAN protocol layout + packed shards round-trip."""
    import io
    from contextlib import redirect_stdout

    from tpgan_tpu import cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([
            "synth-data", "--out", str(tmp_path), "--protocol", "gan",
            "--subjects", "2", "--render-size", "144", "--pack",
        ])
    assert rc == 0
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["gan_train_items"] == 2 * 8  # 9 cameras, 1 frontal

    from tpgan_tpu.data.multipie import TrainDataset
    from tpgan_tpu.data.packing import PackedDataset

    packed = PackedDataset(out["gan_packed"])
    with open(out["gan_img_list"]) as f:
        files = TrainDataset([l.strip() for l in f if l.strip()])
    assert len(packed) == len(files) == 16
    a, b = packed[3], files[3]
    assert set(a) == set(b)
    # uint8 quantisation in the shards: within 1/127.5 of the file path
    np.testing.assert_allclose(a["img"], b["img"], atol=1.0 / 127.0)
    assert int(a["label"]) == int(b["label"])


def test_cli_device_probe_fails_fast(monkeypatch, capsys):
    """Chip-bound commands must exit 3 with a clear message when the
    accelerator is unreachable — not hang in PJRT init (the device
    tunnel's observed failure mode). Host-side commands skip the probe
    entirely."""
    from tpgan_tpu import cli
    from tpgan_tpu.utils import device_check

    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # pretend tunneled TPU
    monkeypatch.delenv("TPGAN_SKIP_DEVICE_CHECK", raising=False)
    monkeypatch.setattr(device_check, "device_available", lambda *a: False)

    rc = cli.main(["eval", "--img-list", "/nonexistent"])
    assert rc == 3
    assert "unreachable" in capsys.readouterr().err

    # the env opt-out restores the old behavior (command proceeds and
    # fails on its own terms — here, the missing file)
    monkeypatch.setenv("TPGAN_SKIP_DEVICE_CHECK", "1")
    try:
        cli.main(["eval", "--img-list", "/nonexistent"])
    except (FileNotFoundError, OSError):
        pass
    else:  # some codepaths may surface the missing list differently
        pass


def test_cli_pretrain_device_data_end_to_end(tmp_path):
    """cmd_pretrain --device-data over a multi-bucket synthetic layout:
    per-bucket uint8 stacks land on device once, training/validation
    batches are gathered on device (the fix for the remoted-PJRT
    device_put leak that OOM-killed the first 1024-bucket smoke)."""
    from PIL import Image

    from tpgan_tpu import cli

    root = tmp_path / "celeba"
    (root / "imgs").mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = ["8", "header"]
    for i in range(8):
        # alternate source sizes so both buckets are populated
        h, w = (50, 40) if i % 2 else (100, 90)
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "imgs" / f"{i:06d}.jpg")
        lines.append(f"{i:06d}.jpg 10 12 30 12 20 25 15 35 25 35")
    (root / "list_landmarks_celeba.txt").write_text("\n".join(lines) + "\n")

    rc = cli.main([
        "pretrain", "--device-data",
        "--checkpoint", str(tmp_path / "ck"),
        "--set", f"pretrain.data_root_dir={root}",
        "--set", f"pretrain.log_root_dir={tmp_path / 'logs'}",
        "--set", "pretrain.image_buckets=(64,128)",
        "--set", "pretrain.batch_size=2",
        "--set", "pretrain.num_epochs=1",
        "--set", "pretrain.log_step_of_batchs=2",
        "--set", "pretrain.train_data_ratio=0.5",
        "--set", "pretrain.validation_data_ratio=0.25",
    ])
    assert rc == 0
    from tpgan_tpu.train.checkpoint import latest_step

    assert latest_step(str(tmp_path / "ck")) is not None


def test_cli_export_fp32_and_int8(tmp_path):
    """cmd_export: the serving deployable straight from the CLI — fp32
    and int8-PTQ StableHLO artifacts that load back and run (params,
    EMA-preferred, baked in; synthetic-protocol calibration)."""
    from tpgan_tpu import cli
    from tpgan_tpu.serving import load_synthesis

    small = ["--set", "G.fm_multiplier=0.25",
             "--set", "G.local_feature_layer_dim=16",
             "--set", "compute_dtype=float32"]
    out = tmp_path / "synthesis.stablehlo"
    # dual-platform artifact: lowered for cpu AND tpu from the cpu
    # backend (neither target needs to be attached at export time) —
    # the portable build-on-CPU-host / serve-on-TPU deployable
    rc = cli.main(["export", "--output", str(out), "--batch", "2",
                   "--platforms", "cpu,tpu", *small])
    assert rc == 0 and out.stat().st_size > 0

    out8 = tmp_path / "synthesis_int8.stablehlo"
    rc = cli.main(["export", "--output", str(out8), "--batch", "2",
                   "--int8", "--calib-items", "4", *small])
    assert rc == 0 and out8.stat().st_size > 0

    rng = np.random.RandomState(0)
    batch = {
        "img": rng.randn(2, 128, 128, 3).astype(np.float32),
        "left_eye": rng.randn(2, 40, 40, 3).astype(np.float32),
        "right_eye": rng.randn(2, 40, 40, 3).astype(np.float32),
        "nose": rng.randn(2, 32, 40, 3).astype(np.float32),
        "mouth": rng.randn(2, 32, 48, 3).astype(np.float32),
    }
    z = np.zeros((2, 64), np.float32)
    for path in (out, out8):
        got = np.asarray(load_synthesis(str(path))(batch, z))
        assert got.shape == (2, 128, 128, 3) and np.isfinite(got).all()

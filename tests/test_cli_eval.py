"""CLI eval subcommand end-to-end on a synthetic Multi-PIE layout."""

import json

import numpy as np


def _make_multipie(tmp_path, n_subjects=2):
    from PIL import Image

    from tpgan_tpu.data.patches import PATCH_SIZES

    root = tmp_path / "mpie"
    split = root / "train"
    for sub in ["train", "32x32", "64x64"]:
        (root / sub).mkdir(parents=True)
    for part in PATCH_SIZES:
        (root / "patch" / part).mkdir(parents=True)

    rng = np.random.RandomState(0)

    def save(path, h, w):
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)

    paths = []
    for subject in range(1, n_subjects + 1):
        for cam in ["140", "051"]:
            name = f"{subject:03d}_01_01_{cam}_00.png"
            save(split / name, 128, 128)
            save(root / "32x32" / name, 32, 32)
            save(root / "64x64" / name, 64, 64)
            for part, (w, h) in PATCH_SIZES.items():
                save(root / "patch" / part / name, h, w)
        paths.append(str(split / f"{subject:03d}_01_01_140_00.png"))
    return paths


def test_cli_eval(tmp_path, capsys):
    from tpgan_tpu import cli

    paths = _make_multipie(tmp_path)
    lst = tmp_path / "img.list"
    lst.write_text("\n".join(paths) + "\n")

    rc = cli.main([
        "eval",
        "--img-list", str(lst),
        "--batch-size", "2",
        "--set", "G.fm_multiplier=0.25",
        "--set", "G.local_feature_layer_dim=16",
        "--set", "compute_dtype=float32",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["num_images"] == 2
    assert np.isfinite(out["psnr"]) and -1.0 <= out["ssim"] <= 1.0


import os
import pytest


@pytest.mark.skipif(
    not os.environ.get("TPGAN_SLOW_TESTS"),
    reason="compiles the full sharded GAN step from scratch (~20+ min on "
    "this 1-core host); run_gan_training is covered directly in "
    "test_gan_loop.py. Set TPGAN_SLOW_TESTS=1 to run.",
)
def test_cli_train_smoke(tmp_path):
    """cmd_train end to end: file list -> TrainDataset -> prefetch ->
    sharded WGAN-GP steps -> checkpoint."""
    from tpgan_tpu import cli
    from tpgan_tpu.train.checkpoint import latest_step

    paths = _make_multipie(tmp_path, n_subjects=4)
    lst = tmp_path / "img.list"
    lst.write_text("\n".join(paths) + "\n")

    rc = cli.main([
        "train",
        "--steps", "2",
        "--checkpoint", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "logs"),
        "--set", f"train.img_list={lst}",
        "--set", "train.batch_size=8",
        "--set", "train.checkpoint_every_steps=0",
        "--set", "G.fm_multiplier=0.25",
        "--set", "G.local_feature_layer_dim=16",
        "--set", "D.fm_multiplier=0.25",
        "--set", "compute_dtype=float32",
        "--set", "mesh.data=8",
    ])
    assert rc == 0
    assert latest_step(str(tmp_path / "ck")) == 2

"""Synthetic-face protocol: rendering determinism, landmark fidelity,
and corpus-layout round trips through the real dataset readers."""

import numpy as np
import pytest

from tpgan_tpu.data.synthetic_faces import (
    CAMERA_YAWS,
    generate_gan_protocol,
    generate_pretrain_protocol,
    identity_params,
    landmarks68_string,
    render_face,
)
from tpgan_tpu.utils.misc import five_landmarks_from_68


def test_render_deterministic_and_distinct():
    img_a, lm_a = render_face(5, 30.0, 128)
    img_b, lm_b = render_face(5, 30.0, 128)
    assert np.array_equal(img_a, img_b) and np.array_equal(lm_a, lm_b)
    assert img_a.shape == (128, 128, 3) and img_a.dtype == np.uint8
    assert lm_a.shape == (5, 2)

    img_c, _ = render_face(6, 30.0, 128)   # different identity
    img_d, lm_d = render_face(5, -30.0, 128)  # different pose
    assert np.abs(img_a.astype(int) - img_c.astype(int)).mean() > 1.0
    assert np.abs(img_a.astype(int) - img_d.astype(int)).mean() > 1.0
    assert not np.allclose(lm_a, lm_d)


def test_landmarks_track_rendered_features():
    """The eye landmark must sit on the rendered pupil (near-black) and
    the nose landmark inside the face, for every camera yaw."""
    for cam, yaw in CAMERA_YAWS.items():
        img, lm = render_face(11, yaw, 128)
        for eye in (lm[0], lm[1]):
            x, y = int(round(eye[0])), int(round(eye[1]))
            patch = img[max(y - 2, 0) : y + 3, max(x - 2, 0) : x + 3]
            assert patch.min() < 60, f"no pupil at eye landmark, cam {cam}"
        assert 0 <= lm[2, 0] < 128 and 0 <= lm[2, 1] < 128


def test_yaw_moves_nose_most():
    """The nose tip carries the most depth, so it must shift laterally
    more than the mouth corners under yaw (the 3-D projection)."""
    _, lm0 = render_face(3, 0.0, 128)
    _, lm45 = render_face(3, 45.0, 128)
    nose_shift = abs(lm45[2, 0] - lm0[2, 0])
    mouth_shift = abs((lm45[3, 0] + lm45[4, 0]) / 2 - (lm0[3, 0] + lm0[4, 0]) / 2)
    assert nose_shift > mouth_shift > 0


def test_identity_params_deterministic():
    a, b = identity_params(42), identity_params(42)
    for k in a:
        assert np.array_equal(a[k], b[k])


def test_landmarks68_roundtrip():
    _, lm5 = render_face(2, 15.0, 144)
    lm68 = np.asarray(
        landmarks68_string(lm5).split(), np.float32
    ).reshape(-1, 2)
    assert lm68.shape == (68, 2)
    back = five_landmarks_from_68(lm68)
    np.testing.assert_allclose(back, lm5, atol=0.01)


def test_gan_protocol_layout(tmp_path):
    """generate_gan_protocol -> real TrainDataset round trip: layout,
    frontal twins, 15-tensor contract, labels."""
    from tpgan_tpu.data.multipie import TrainDataset, frontal_twin_path

    out = str(tmp_path / "gan")
    cams = ("090", "051", "140")
    train_list = generate_gan_protocol(out, 2, cameras=cams, render_size=144)
    # non-frontal only: 2 subjects x 2 profile cameras
    assert len(train_list) == 4
    assert all("_051_" not in p for p in train_list)

    ds = TrainDataset(train_list)
    item = ds[0]
    assert item["img"].shape == (128, 128, 3)
    assert item["img32"].shape == (32, 32, 3)
    assert item["left_eye"].shape == (40, 40, 3)
    assert item["nose"].shape == (32, 40, 3)
    assert item["mouth"].shape == (32, 48, 3)
    assert item["img_frontal"].shape == (128, 128, 3)
    assert -1.0 <= item["img"].min() and item["img"].max() <= 1.0
    assert int(item["label"]) in (0, 1)
    # the frontal twin is a DIFFERENT image (pose actually changes pixels)
    assert np.abs(item["img"] - item["img_frontal"]).mean() > 0.01

    # img.list on disk matches
    with open(f"{out}/img.list") as f:
        assert len([l for l in f if l.strip()]) == 4


def test_pretrain_protocol_layout(tmp_path):
    """generate_pretrain_protocol -> CelebALandmarkDataset round trip."""
    from tpgan_tpu.data.celeba import CelebALandmarkDataset

    out = str(tmp_path / "pre")
    txt = generate_pretrain_protocol(out, 6, sizes=(150, 200), num_subjects=4)
    ds = CelebALandmarkDataset(txt, out, image_size=256)
    assert len(ds) == 6
    img, label = ds[0]
    assert img.shape == (256, 256, 3)
    assert label.shape == (8,)
    # labels must land inside the letterboxed image
    assert (label >= 0).all() and (label <= 256).all()


def test_identity_dataset(tmp_path):
    from tpgan_tpu.data.multipie import IdentityImageDataset

    out = str(tmp_path / "gan")
    train_list = generate_gan_protocol(
        out, 2, cameras=("051", "140"), render_size=144
    )
    import glob

    paths = sorted(glob.glob(f"{out}/train/*.png"))
    ds = IdentityImageDataset(paths)
    img, label = ds[0]
    assert img.shape == (128, 128, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0
    assert int(label) in (0, 1)

"""Real-corpus robustness for the data parsers (VERDICT r3 item 7).

The synthetic protocol writers emit clean files; the real corpora carry
quirks the reference's own code implies:

* Windows-style name fields split on '\\' (DataAndDataset.py:77);
* CRLF line endings / trailing whitespace / tab runs in the CelebA
  landmark txt (DataAndDataset.py:123-151 splits on whitespace);
* 69-row landmark files implied by the (68, 68) index range at
  UtilityMethods.py:148 — AND standard 68-row dlib output;
* .jpg files on disk with no landmark row (os.walk collects everything,
  DataAndDataset.py:170-174).
"""

import os

import numpy as np
import pytest

from tpgan_tpu.data.celeba import (
    CelebALandmarkDataset,
    parse_celeba_landmarks,
)
from tpgan_tpu.data.multipie import TestDataset, frontal_twin_path
from tpgan_tpu.utils.misc import five_landmarks_from_68

ROW = "{name} 10 20 30 20 20 32 15 40 25 40"


def _write(tmp_path, body, newline=""):
    p = tmp_path / "list_landmarks_celeba.txt"
    with open(p, "w", newline=newline) as f:
        f.write(body)
    return str(p)


def test_parse_crlf_and_trailing_whitespace(tmp_path):
    body = (
        "2\r\n"
        "image_id lefteye_x ... \r\n"
        + ROW.format(name="a.jpg") + "  \r\n"
        + ROW.format(name="b.jpg").replace(" ", "\t") + "\r\n"
    )
    labels = parse_celeba_landmarks(_write(tmp_path, body))
    assert set(labels) == {"a.jpg", "b.jpg"}
    np.testing.assert_allclose(labels["a.jpg"][:2], [10, 20])
    # mouth midpoint rule: ((15+25)//2, (40+40)//2)
    np.testing.assert_allclose(labels["b.jpg"][6:], [20, 40])


def test_parse_windows_backslash_names_and_bom(tmp_path):
    body = (
        "﻿1\n"
        "header\n"
        + ROW.format(name="img\\celeba\\000001.jpg") + "\n"
        + ROW.format(name="img/000002.jpg") + "\n"
    )
    labels = parse_celeba_landmarks(_write(tmp_path, body))
    # keyed by basename across both separators (DataAndDataset.py:77)
    assert set(labels) == {"000001.jpg", "000002.jpg"}


def test_parse_float_formatted_and_garbage_rows(tmp_path):
    body = (
        "3\n"
        "header\n"
        "c.jpg 10.0 20.5 30 20 20 32 15 40 25 40\n"
        "broken.jpg ten twenty 30 20 20 32 15 40 25 40\n"
        "short.jpg 1 2 3\n"
        "\n"
    )
    labels = parse_celeba_landmarks(_write(tmp_path, body))
    assert set(labels) == {"c.jpg"}  # parseable row kept, garbage skipped
    np.testing.assert_allclose(labels["c.jpg"][:2], [10, 20])  # int(float())


def test_dataset_skips_unlabelled_images(tmp_path):
    from PIL import Image

    root = tmp_path / "celeba"
    os.makedirs(root / "img")
    body = "1\nheader\n" + ROW.format(name="good.jpg") + "\n"
    with open(root / "list_landmarks_celeba.txt", "w") as f:
        f.write(body)
    for name in ("good.jpg", "stray.jpg"):
        Image.fromarray(
            np.zeros((64, 64, 3), np.uint8)
        ).save(root / "img" / name)

    ds = CelebALandmarkDataset(
        "list_landmarks_celeba.txt", str(root), image_size=64
    )
    assert len(ds) == 1  # stray.jpg dropped at init instead of KeyError
    boxed, label = ds[0]
    assert boxed.shape == (64, 64, 3)
    np.testing.assert_allclose(label[:2], [10, 20])


def test_five_landmarks_68_and_69_rows():
    lm69 = np.arange(69 * 2, dtype=np.float32).reshape(69, 2)
    out69 = five_landmarks_from_68(lm69)
    # reference semantics: (68, 68) range = the 69th row exactly
    np.testing.assert_allclose(out69[4], lm69[68])
    lm68 = lm69[:68]
    out68 = five_landmarks_from_68(lm68)
    # documented fallback on true 68-row dlib output: index 54
    np.testing.assert_allclose(out68[4], lm68[54])
    # shared ranges agree between the two widths
    np.testing.assert_allclose(out68[:4], out69[:4])


def test_testdataset_landmark_string_whitespace(tmp_path):
    from PIL import Image

    img_path = str(tmp_path / "probe.png")
    Image.fromarray(np.full((100, 80, 3), 128, np.uint8)).save(img_path)
    lm = np.tile(np.asarray([[40.0, 50.0]], np.float32), (68, 1))
    # tab- and multi-space separated with a CRLF tail
    lm_string = "\t".join(f"{v:.1f}  " for v in lm.reshape(-1)) + "\r\n"
    ds = TestDataset([img_path], [lm_string])
    batch = ds[0]
    assert batch["img"].shape == (128, 128, 3)
    assert batch["left_eye"].shape == (40, 40, 3)
    assert np.isfinite(batch["img"]).all()


@pytest.mark.parametrize(
    "path,expect",
    [
        ("data/train/001_01_110_00.png", "data/train/001_01_051_00.png"),
        # underscores in parent directories (reference splits the WHOLE
        # path, DataAndDataset.py:203-205 — token[-2] is still the camera)
        ("my_data/train/001_01_110_00.png", "my_data/train/001_01_051_00.png"),
        # real Multi-PIE pair-form camera labels with session/recording
        # fields: camera '11_0' -> frontal '05_1' (VERDICT r4 item 8)
        ("mp/001_01_01_11_0_00.png", "mp/001_01_01_05_1_00.png"),
        ("mp/042_02_03_24_0_07.png", "mp/042_02_03_05_1_07.png"),
        # pair-form frontal maps to itself
        ("mp/001_01_01_05_1_00.png", "mp/001_01_01_05_1_00.png"),
        # uppercase extension rides through untouched
        ("mp/001_01_01_19_1_00.PNG", "mp/001_01_01_05_1_00.PNG"),
    ],
)
def test_frontal_twin_path(path, expect):
    assert frontal_twin_path(path) == expect


@pytest.mark.parametrize(
    "name,expect",
    [
        ("001_01_051_00.png", "051"),                 # flattened protocol
        ("001_01_110_00.png", "110"),
        ("001_01_01_05_1_00.png", "051"),             # real pair form
        ("001_01_01_19_1_00.PNG", "191"),
        ("042_02_03_24_0_07.png", "240"),
        ("/abs/dir/001_01_01_08_1_00.png", "081"),    # full path ok
        ("weird.png", ""),                            # no tokens at all
    ],
)
def test_camera_token(name, expect):
    from tpgan_tpu.data.multipie import camera_token

    assert camera_token(name) == expect


def test_parse_rows_with_extra_trailing_columns(tmp_path):
    """Annotated CelebA variants append extra columns after the 10
    coordinates — the first 10 numbers after the name are the landmark
    contract; extras are ignored instead of dropping the row."""
    body = (
        "2\n"
        "header\n"
        + ROW.format(name="a.jpg") + " 99 98 97\n"      # 14 fields
        + ROW.format(name="b.jpg") + " extra_tag\n"      # non-numeric tail
    )
    labels = parse_celeba_landmarks(_write(tmp_path, body))
    assert set(labels) == {"a.jpg", "b.jpg"}
    np.testing.assert_allclose(labels["a.jpg"][:2], [10, 20])
    np.testing.assert_allclose(labels["a.jpg"][6:], [20, 40])


def test_find_images_uppercase_extensions(tmp_path):
    from PIL import Image

    from tpgan_tpu.data.celeba import find_images

    os.makedirs(tmp_path / "img")
    for name in ("a.jpg", "B.JPG", "c.jpeg"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
            tmp_path / "img" / name
        )
    found = {os.path.basename(p) for p in find_images(str(tmp_path))}
    assert found == {"a.jpg", "B.JPG"}  # .jpeg is a different suffix


def test_train_dataset_pair_form_names(tmp_path):
    """TrainDataset loads a pair-form-named item end to end: the frontal
    twin resolves through the '05_1' camera label and the subject label
    still comes from the first token."""
    from PIL import Image

    from tpgan_tpu.data.multipie import PART_NAMES, TrainDataset

    root = tmp_path / "mp"
    sizes = {"train": 128, "32x32": 32, "64x64": 64}
    parts_hw = {"left_eye": (40, 40), "right_eye": (40, 40),
                "nose": (32, 40), "mouth": (32, 48)}
    names = ["007_01_01_11_0_00.png", "007_01_01_05_1_00.png"]
    for sub, size in sizes.items():
        os.makedirs(root / sub, exist_ok=True)
        for n in names:
            Image.fromarray(np.zeros((size, size, 3), np.uint8)).save(
                root / sub / n
            )
    for part, (h, w) in parts_hw.items():
        os.makedirs(root / "patch" / part, exist_ok=True)
        for n in names:
            Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
                root / "patch" / part / n
            )
    ds = TrainDataset([str(root / "train" / names[0])])
    item = ds[0]
    assert int(item["label"]) == 7
    assert item["img"].shape == (128, 128, 3)
    assert item["img_frontal"].shape == (128, 128, 3)
    for part in PART_NAMES:
        assert (part + "_frontal") in item

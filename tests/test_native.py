"""Native C++ host-pipeline kernels: build, load, and numerical parity
with the Python implementations."""

import numpy as np
import pytest

from tpgan_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_u8_to_pm1_parity(lib):
    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (37, 23, 3), np.uint8)
    got = native.u8_to_pm1(src)
    want = (2.0 * src.astype(np.float32) - 255.0) / 255.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.dtype == np.float32


def test_u8_to_pm1_endpoint_exact(lib):
    """0 -> -1.0 and 255 -> 1.0 EXACTLY (the naive v*(2/255)-1 formula
    overshoots the top end to 1.0000001, breaking the [-1, 1] contract)."""
    got = native.u8_to_pm1(np.array([0, 255], np.uint8))
    assert got[0] == -1.0 and got[1] == 1.0


def test_u8_to_unit_parity(lib):
    src = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    got = native.u8_to_unit(src)
    np.testing.assert_allclose(got, src.astype(np.float32) / 255.0, rtol=1e-6)


def test_crop_patch_parity(lib):
    from tpgan_tpu.data.patches import crop_patches

    rng = np.random.RandomState(1)
    img = rng.rand(128, 128, 3).astype(np.float32)
    lm = np.asarray(
        [[39.4, 40.2], [86.0, 38.7], [63.6, 63.6], [45.7, 90.0], [83.9, 88.7]],
        np.float32,
    )
    want = crop_patches(img, lm.copy())
    centers = lm.copy()
    centers[3] = (lm[3] + lm[4]) / 2.0
    sizes = {"left_eye": (40, 40), "right_eye": (40, 40),
             "nose": (40, 32), "mouth": (48, 32)}
    for i, (name, wh) in enumerate(sizes.items()):
        got = native.crop_patch(img, tuple(centers[i]), wh)
        np.testing.assert_allclose(got, want[name], rtol=1e-6, err_msg=name)


def test_crop_patch_out_of_bounds(lib):
    img = np.ones((64, 64, 3), np.float32)
    got = native.crop_patch(img, (1.0, 1.0), (40, 40))
    assert got.shape == (40, 40, 3)
    assert got[0, 0].sum() == 0.0  # zero-padded corner
    assert got[-1, -1].sum() == 3.0


def test_letterbox_matches_torch_bilinear(lib):
    """Our native bilinear is point-sampled (align_corners=False, no
    antialias) — exactly torch F.interpolate's semantics. PIL's BILINEAR
    antialiases on downscale, so torch is the right oracle; the PIL path
    (data.celeba.letterbox) remains the parity default for datasets."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    src = rng.randint(0, 256, (218, 178, 3), np.uint8)
    got, scale, (pl, pt) = native.letterbox(src, 128)

    from tpgan_tpu.data.celeba import letterbox as py_letterbox

    _, scale_py, (pl_py, pt_py) = py_letterbox(src, 128)
    assert got.shape == (128, 128, 3)
    assert abs(scale - scale_py) < 1e-6
    assert (pl, pt) == (pl_py, pt_py)

    nh = int(round(218 * scale))
    nw = int(round(178 * scale))
    t = torch.from_numpy(src.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
    want_inner = (
        F.interpolate(t, size=(nh, nw), mode="bilinear", align_corners=False)
        [0].permute(1, 2, 0).numpy()
    )
    inner = got[pt : pt + nh, pl : pl + nw]
    np.testing.assert_allclose(inner, want_inner, atol=2e-2)

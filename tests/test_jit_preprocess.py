"""On-device preprocessing pipeline vs the host TestDataset path."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.data.jit_preprocess import (
    five_landmarks_from_68_jax,
    preprocess_for_synthesis,
)
from tpgan_tpu.data.multipie import TestDataset
from tpgan_tpu.utils.misc import five_landmarks_from_68


def test_landmark_reduction_matches_host():
    rng = np.random.RandomState(0)
    lm = rng.rand(2, 68, 2).astype(np.float32) * 100
    got = five_landmarks_from_68_jax(jnp.asarray(lm))
    for b in range(2):
        want = five_landmarks_from_68(lm[b])
        np.testing.assert_allclose(np.asarray(got[b]), want, rtol=1e-5)


def test_preprocess_shapes_and_range():
    rng = np.random.RandomState(1)
    imgs = (rng.rand(2, 200, 180, 3) * 255).astype(np.uint8)
    lm68 = (rng.rand(2, 68, 2) * 150 + 10).astype(np.float32)
    out = jax.jit(preprocess_for_synthesis)(jnp.asarray(imgs), jnp.asarray(lm68))
    assert out["img"].shape == (2, 128, 128, 3)
    assert out["img64"].shape == (2, 64, 64, 3)
    assert out["img32"].shape == (2, 32, 32, 3)
    assert out["left_eye"].shape == (2, 40, 40, 3)
    assert out["mouth"].shape == (2, 32, 48, 3)
    for v in out.values():
        arr = np.asarray(v)
        assert arr.min() >= -1.001 and arr.max() <= 1.001


def test_preprocess_approximates_host_testdataset(tmp_path):
    """jax lanczos3 vs PIL LANCZOS differ slightly at pixel level; the
    full pipelines must agree closely in the image interior and exactly
    in geometry (patch slots carved from the same coordinates)."""
    from PIL import Image

    rng = np.random.RandomState(2)
    # smooth image => resampling differences shrink
    base = rng.rand(25, 23, 3)
    img = np.kron(base, np.ones((8, 8, 1)))[:200, :180]
    img_u8 = (img * 255).astype(np.uint8)
    p = tmp_path / "probe.png"
    Image.fromarray(img_u8).save(p)
    lm68 = (rng.rand(68, 2) * np.asarray([150, 170]) + 10).astype(np.float32)

    host = TestDataset([str(p)], [" ".join(str(float(v)) for v in lm68.reshape(-1))])[0]
    dev = jax.jit(preprocess_for_synthesis)(
        jnp.asarray(img_u8)[None], jnp.asarray(lm68)[None]
    )

    for key in ("img", "img64", "img32"):
        a = np.asarray(dev[key][0])
        b = host[key]
        assert np.abs(a - b).mean() < 0.03, key
    for key in ("left_eye", "right_eye", "nose", "mouth"):
        a = np.asarray(dev[key][0])
        b = host[key]
        assert a.shape == b.shape, key
        assert np.abs(a - b).mean() < 0.06, (key, np.abs(a - b).mean())

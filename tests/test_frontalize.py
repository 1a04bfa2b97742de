"""Full-stack frontalize path: on-device letterbox geometry, detector
coordinate unmapping, and the fused raw-image -> frontal program."""

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import make_config
from tpgan_tpu.data.celeba import letterbox as host_letterbox
from tpgan_tpu.frontalize import detect_lm5, letterbox_batch, make_frontalize_fn


def test_letterbox_batch_matches_host_geometry():
    rng = np.random.RandomState(0)
    for h, w, size, up in [(100, 180, 256, False), (300, 200, 256, False),
                           (64, 48, 128, True)]:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        want, scale, (pl, pt) = host_letterbox(img, size, allow_upscale=up)
        got, g_scale, (g_pl, g_pt) = jax.jit(
            lambda x: letterbox_batch(x, size, allow_upscale=up)
        )(jnp.asarray(img)[None])
        got = np.asarray(got)[0]
        assert g_scale == scale and (g_pl, g_pt) == (pl, pt)
        assert got.shape == want.shape == (size, size, 3)
        # zero-pad regions coincide exactly; interior content agrees to
        # resampler tolerance (PIL BILINEAR vs jax bilinear)
        mask = want == 0.0
        np.testing.assert_array_equal(got[mask & (got != 0)], [])
        if scale == 1.0:  # pure padding: content must be bit-identical
            np.testing.assert_allclose(got, want, atol=1e-6)


class _StubDetector:
    """Emits one candidate per part at fixed letterbox-frame points."""

    def __init__(self, pts_boxed: np.ndarray):  # (4, 2)
        self.pts = pts_boxed

    def clone(self, **kw):
        return self

    def apply(self, variables, x, train=False):
        b = x.shape[0]
        loc = jnp.tile(jnp.asarray(self.pts, jnp.float32)[None], (b, 1, 1))
        cls = jnp.full((b, 4, 5), -10.0)
        cls = cls.at[:, jnp.arange(4), jnp.arange(4)].set(10.0)
        return loc, cls


def test_detect_lm5_unmaps_to_source_frame():
    h, w, size = 180, 120, 256  # scale 1 (fits), centred pads
    scale = 1.0
    pl, pt = (size - w) // 2, (size - h) // 2
    src_pts = np.asarray(
        [[30.0, 60.0], [80.0, 58.0], [55.0, 90.0], [54.0, 130.0]], np.float32
    )
    boxed_pts = src_pts * scale + np.asarray([pl, pt], np.float32)
    det = _StubDetector(boxed_pts)
    images = jnp.zeros((2, h, w, 3), jnp.uint8)
    lm5, valid, scores = detect_lm5(det, {}, images, detector_size=size)
    lm5 = np.asarray(lm5)
    assert lm5.shape == (2, 5, 2) and np.asarray(valid).all()
    assert np.asarray(scores).shape == (2, 4)
    assert (np.asarray(scores) > 0.9).all()  # stub logits are one-hot +10
    np.testing.assert_allclose(lm5[0, :4], src_pts, atol=1e-4)
    # mouth midpoint duplicated into both corner slots
    np.testing.assert_allclose(lm5[0, 3], lm5[0, 4])


def test_frontalize_end_to_end_shapes():
    cfg = make_config(
        {"G": {"fm_multiplier": 0.25, "local_feature_layer_dim": 16},
         "D": {"fm_multiplier": 0.25}, "compute_dtype": "float32"}
    )
    from tpgan_tpu.train.gan_trainer import create_gan_state
    from tpgan_tpu.train.pretrain import create_pretrain_state

    det_state, detector, _ = create_pretrain_state(
        cfg, jax.random.PRNGKey(0)
    )
    det_vars = {"params": det_state.params,
                "batch_stats": det_state.batch_stats}
    state, gen, *_ = create_gan_state(cfg, jax.random.PRNGKey(1))

    fn = jax.jit(make_frontalize_fn(cfg, detector, gen, detector_size=128))
    rng = np.random.RandomState(0)
    images = jnp.asarray((rng.rand(2, 150, 110, 3) * 255).astype(np.uint8))
    z = jnp.zeros((2, cfg.G.zdim), jnp.float32)
    fake, lm5, scores = fn(state.g_params, det_vars, images, z)
    assert fake.shape == (2, 128, 128, 3)
    assert lm5.shape == (2, 5, 2)
    assert scores.shape == (2, 4)
    assert np.isfinite(np.asarray(fake)).all()
    assert np.isfinite(np.asarray(lm5)).all()

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
    lm5, valid, scores = detect_lm5(
        det, {}, images, detector_size=size, allow_upscale=False
    )
    lm5 = np.asarray(lm5)
    assert lm5.shape == (2, 5, 2) and np.asarray(valid).all()
    assert np.asarray(scores).shape == (2, 4)
    assert (np.asarray(scores) > 0.9).all()  # stub logits are one-hot +10
    np.testing.assert_allclose(lm5[0, :4], src_pts, atol=1e-4)
    # mouth midpoint duplicated into both corner slots
    np.testing.assert_allclose(lm5[0, 3], lm5[0, 4])


def test_detect_lm5_upscale_divides_error_by_scale():
    """Default serving geometry: a small source image is letterboxed UP
    to the detector frame (scale 2 for 128->256), and detector-frame
    coordinates unmap by dividing by that scale — so detector-frame
    error shrinks 2x in the source frame (the round-4 full-stack-gap
    root cause: artifacts/serving_scale_probe_r4.json)."""
    h = w = 128
    size = 256  # scale = 2.0, no pad
    src_pts = np.asarray(
        [[30.0, 60.0], [80.0, 58.0], [55.0, 90.0], [54.0, 110.0]], np.float32
    )
    det = _StubDetector(src_pts * 2.0)
    images = jnp.zeros((2, h, w, 3), jnp.uint8)
    lm5, valid, _scores = detect_lm5(det, {}, images, detector_size=size)
    np.testing.assert_allclose(np.asarray(lm5)[0, :4], src_pts, atol=1e-4)
    assert np.asarray(valid).all()
    # a 4 px detector-frame perturbation lands 2 px off in source frame
    det2 = _StubDetector(src_pts * 2.0 + np.asarray([4.0, 0.0]))
    lm5b, _, _ = detect_lm5(det2, {}, images, detector_size=size)
    np.testing.assert_allclose(
        np.asarray(lm5b)[0, :4] - np.asarray(lm5)[0, :4],
        np.tile([2.0, 0.0], (4, 1)), atol=1e-4,
    )


def test_eval_g_params_select():
    from tpgan_tpu.train.gan_trainer import GANTrainState, eval_g_params

    live = {"w": jnp.ones(2)}
    ema = {"w": jnp.full(2, 3.0)}
    s_ema = GANTrainState(step=0, g_params=live, d_params={}, g_opt_state=None, d_opt_state=None, g_ema_params=ema)
    s_live = GANTrainState(step=0, g_params=live, d_params={}, g_opt_state=None, d_opt_state=None)
    assert eval_g_params(s_ema) is ema
    assert eval_g_params(s_ema, "ema") is ema
    assert eval_g_params(s_ema, "live") is live
    assert eval_g_params(s_live) is live
    assert eval_g_params(s_live, "live") is live
    import pytest

    with pytest.raises(ValueError):
        eval_g_params(s_live, "ema")
    with pytest.raises(ValueError):
        eval_g_params(s_ema, "bogus")


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


class _ContentStubDetector:
    """Emits per-part candidates around the intensity centroid of each
    image, so the mirrored half of a TTA batch genuinely produces
    mirrored coordinates. ``sabotage_left=True`` additionally emits a
    far-off low-confidence nose whenever the marker sits in the LEFT
    half — i.e. only for the unmirrored pass of a left-marker image."""

    head_mode = "absolute"

    def __init__(self, sabotage_left=False):
        self.sabotage_left = sabotage_left

    def clone(self, **kw):
        return self

    def apply(self, variables, x, train=False):
        xf = x[..., 0].astype(jnp.float32)
        tot = jnp.sum(xf, axis=(1, 2)) + 1e-9
        ys = jnp.sum(
            xf * jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None],
            axis=(1, 2)) / tot
        xs = jnp.sum(
            xf * jnp.arange(x.shape[2], dtype=jnp.float32)[None, None, :],
            axis=(1, 2)) / tot
        c = jnp.stack([xs, ys], axis=-1)  # (B, 2)
        offs = jnp.asarray(
            [[-10.0, 0.0], [10.0, 0.0], [0.0, 10.0], [0.0, 20.0]]
        )
        loc = c[:, None, :] + offs[None]
        cls = jnp.full((x.shape[0], 4, 5), -10.0)
        cls = cls.at[:, jnp.arange(4), jnp.arange(4)].set(10.0)
        if self.sabotage_left:
            left = xs < x.shape[2] / 2  # marker in left half
            bad_nose = jnp.asarray([200.0, 30.0])
            loc = loc.at[:, 2, :].set(
                jnp.where(left[:, None], bad_nose[None], loc[:, 2, :])
            )
            # lower confidence for the sabotaged nose
            cls = cls.at[:, 2, 2].set(jnp.where(left, 2.0, 10.0))
        return loc, cls


def test_detect_lm5_tta_mirror_swap_and_fuse():
    """TTA: the mirrored decode maps back exactly (x -> size-1-x, eye
    classes swapped) and fuses with the direct decode. A wrong/missing
    class swap would fuse the eyes toward the midpoint — the wide agree
    radius makes that detectable as a shifted output."""
    size = 256
    img = np.zeros((1, size, size, 3), np.uint8)
    img[0, 100, 60, :] = 255  # marker at (x=60, y=100)
    det = _ContentStubDetector()
    lm5, valid, scores = detect_lm5(
        det, {}, jnp.asarray(img), detector_size=size,
        tta=True, tta_agree_radius=25.0,
    )
    want = np.asarray(
        [[50.0, 100.0], [70.0, 100.0], [60.0, 110.0], [60.0, 120.0]]
    )
    np.testing.assert_allclose(np.asarray(lm5)[0, :4], want, atol=0.75)
    assert np.asarray(valid).all()


class _ScaleKeyedStubDetector:
    """Centroid detector that sabotages the nose ONLY in the coarse
    letterbox pass. The two passes are told apart by total image energy:
    bilinear resampling scales the marker's summed intensity by ~s^2, and
    the refine crop zooms far harder (s ~7) than the letterbox (s = 2),
    so a low-sum frame is the coarse pass."""

    head_mode = "absolute"

    def clone(self, **kw):
        return self

    def apply(self, variables, x, train=False):
        xf = x[..., 0].astype(jnp.float32)
        tot = jnp.sum(xf, axis=(1, 2)) + 1e-9
        ys = jnp.sum(
            xf * jnp.arange(x.shape[1], dtype=jnp.float32)[None, :, None],
            axis=(1, 2)) / tot
        xs = jnp.sum(
            xf * jnp.arange(x.shape[2], dtype=jnp.float32)[None, None, :],
            axis=(1, 2)) / tot
        c = jnp.stack([xs, ys], axis=-1)
        offs = jnp.asarray(
            [[-10.0, 0.0], [10.0, 0.0], [0.0, 10.0], [0.0, 20.0]]
        )
        loc = c[:, None, :] + offs[None]
        cls = jnp.full((x.shape[0], 4, 5), -10.0)
        cls = cls.at[:, jnp.arange(4), jnp.arange(4)].set(10.0)
        coarse = tot < 10.0  # letterbox pass: marker energy ~ 2^2
        bad_nose = jnp.asarray([200.0, 30.0])
        loc = loc.at[:, 2, :].set(
            jnp.where(coarse[:, None], bad_nose[None], loc[:, 2, :])
        )
        return loc, cls


def test_detect_lm5_refine_repairs_nose_tail():
    """refine=True: the zoom-crop second stage (geometry from the
    reliable eyes+mouth points) re-detects in a face-filling frame and
    maps back through the crop transform — repairing a catastrophic
    coarse nose decode while keeping the good parts in place. This is
    the serving-path mechanism for the round-4 nose >45 px tail."""
    marker = np.asarray([60.0, 50.0])
    img = np.zeros((1, 128, 128, 3), np.uint8)
    img[0, int(marker[1]), int(marker[0]), :] = 255
    det = _ScaleKeyedStubDetector()
    # coarse pass alone: nose lands catastrophically far (>40 px)
    lm5_c, _, _ = detect_lm5(det, {}, jnp.asarray(img), detector_size=256)
    assert np.linalg.norm(np.asarray(lm5_c)[0, 2] - (marker + [0, 10])) > 40
    lm5, valid, scores = jax.jit(
        lambda im: detect_lm5(det, {}, im, detector_size=256, refine=True)
    )(jnp.asarray(img))
    lm5 = np.asarray(lm5)[0]
    # the nose re-detects in the crop and round-trips its geometry back
    # to the marker neighbourhood (crop-frame offsets shrink by ~1/s)
    assert np.linalg.norm(lm5[2] - marker) < 5.0, lm5[2]
    # eyes/mouth were never broken: refine leaves their coarse serving
    # estimates in place (source-frame offsets +-5/10 px from the marker)
    coarse_offs = np.asarray([[-5.0, 0.0], [5.0, 0.0], [0.0, 10.0]])
    np.testing.assert_allclose(
        lm5[[0, 1, 3]], marker + coarse_offs, atol=1.0
    )
    assert np.asarray(valid).all()


def test_fit_nose_prior_recovers_linear_shape_and_roundtrips(tmp_path):
    """fit_nose_prior recovers a linear nose placement from annotations
    (ridge shrinkage stays small next to real geometric variance) and
    the (7, 2) matrix round-trips through the detector_meta sidecar."""
    from tpgan_tpu.config import make_config
    from tpgan_tpu.train.pretrain import (
        fit_nose_prior,
        load_nose_prior,
        write_detector_meta,
    )

    rng = np.random.RandomState(0)
    le = rng.rand(500, 2) * 100 + 50
    re = le + [60.0, 0.0] + rng.randn(500, 2) * 12
    mouth = le + [30.0, 55.0] + rng.randn(500, 2) * 12
    nose = 0.3 * le + 0.3 * re + 0.4 * mouth + [1.0, -4.0]
    labels = np.stack([le, re, nose, mouth], axis=1)  # (N, 4, 2)
    W = fit_nose_prior(labels, noise_sigma=0.5)
    assert W.shape == (7, 2)
    X = np.concatenate([le, re, mouth, np.ones((500, 1))], axis=1)
    err = np.linalg.norm(X @ W - nose, axis=1)
    assert err.mean() < 2.0, err.mean()

    d = tmp_path / "ckpt"
    write_detector_meta(str(d), make_config(), nose_prior=W)
    np.testing.assert_allclose(load_nose_prior(str(d)), W, rtol=1e-6)
    # sidecar without a prior -> None (pre-round-5 checkpoints)
    d2 = tmp_path / "old"
    write_detector_meta(str(d2), make_config())
    assert load_nose_prior(str(d2)) is None


def test_detect_lm5_nose_gate_snaps_implausible_decode():
    """The shape-prior plausibility gate: a nose decode far from the
    [le, re, mouth] prior prediction snaps TO the prior; an in-gate
    decode passes through untouched, and the other parts never move."""
    h, w, size = 180, 120, 256  # scale 1, centred pads
    pl, pt = (size - w) // 2, (size - h) // 2
    src_pts = np.asarray(
        [[30.0, 60.0], [80.0, 58.0], [55.0, 90.0], [54.0, 130.0]], np.float32
    )
    # prior encodes nose = (le + re)/2 + (0, 31)  (exact for src_pts up
    # to the [0, 1] residual picked up by the bias row)
    W = np.zeros((7, 2), np.float32)
    W[0:2, 0] = [0.5, 0.0]
    W[2:4, 0] = [0.5, 0.0]
    W[0:2, 1] = [0.0, 0.5]
    W[2:4, 1] = [0.0, 0.5]
    W[6] = [0.0, 31.0]
    prior_pred = np.asarray([55.0, 90.0], np.float32)
    images = jnp.zeros((1, h, w, 3), jnp.uint8)
    off = np.asarray([pl, pt], np.float32)

    # in-gate decode (eye distance 50 -> gate 22.5 px): untouched
    det = _StubDetector(src_pts + off)
    lm5, _, _ = detect_lm5(
        det, {}, images, detector_size=size, allow_upscale=False,
        nose_prior=W,
    )
    np.testing.assert_allclose(np.asarray(lm5)[0, :4], src_pts, atol=1e-3)

    # catastrophic decode: snaps exactly to the prior prediction
    bad = src_pts.copy()
    bad[2] = [200.0, 20.0]
    det = _StubDetector(bad + off)
    lm5, _, _ = detect_lm5(
        det, {}, images, detector_size=size, allow_upscale=False,
        nose_prior=W,
    )
    got = np.asarray(lm5)[0]
    np.testing.assert_allclose(got[2], prior_pred, atol=1e-3)
    np.testing.assert_allclose(
        got[[0, 1, 3]], src_pts[[0, 1, 3]], atol=1e-3
    )

    # no prior -> no gate: the catastrophic decode survives
    lm5, _, _ = detect_lm5(
        det, {}, images, detector_size=size, allow_upscale=False
    )
    np.testing.assert_allclose(np.asarray(lm5)[0, 2], [200.0, 20.0], atol=1e-3)


def test_detect_lm5_refine_prior_three_way_vote():
    """refine + nose_prior = pairwise-agreement vote between the coarse
    decode, the zoom-crop re-detection, and the shape prior: whichever
    two concur win, so one bad estimator never decides the nose. Here
    the coarse nose is catastrophic while refined and prior agree — the
    refined estimate wins (snapping to the prior alone would too, but
    the vote must pick refined, the better of the agreeing pair)."""
    marker = np.asarray([60.0, 50.0])
    img = np.zeros((1, 128, 128, 3), np.uint8)
    img[0, int(marker[1]), int(marker[0]), :] = 255
    det = _ScaleKeyedStubDetector()  # coarse pass: nose at (200, 30)
    # prior encodes nose = eye_mid + (0, 10): exact for this stub's
    # geometry (eyes at marker +- (10, 0), nose at marker + (0, 10))
    W = np.zeros((7, 2), np.float32)
    W[0:2, 0] = [0.5, 0.0]
    W[2:4, 0] = [0.5, 0.0]
    W[0:2, 1] = [0.0, 0.5]
    W[2:4, 1] = [0.0, 0.5]
    W[6] = [0.0, 10.0]
    lm5, valid, _ = jax.jit(
        lambda im: detect_lm5(
            det, {}, im, detector_size=256, refine=True, nose_prior=W
        )
    )(jnp.asarray(img))
    lm5 = np.asarray(lm5)[0]
    # refined-and-prior agree near marker + (0, 10); coarse (200, 30)
    # loses despite its high confidence
    np.testing.assert_allclose(lm5[2], marker + [0.0, 10.0], atol=5.0)
    # eyes/mouth keep the coarse serving estimates
    coarse_offs = np.asarray([[-5.0, 0.0], [5.0, 0.0], [0.0, 10.0]])
    np.testing.assert_allclose(
        lm5[[0, 1, 3]], marker + coarse_offs, atol=1.0
    )

    # bad PRIOR, good coarse+refined: their agreement outvotes it
    W_bad = W.copy()
    W_bad[6] = [500.0, 500.0]
    det_ok = _ContentStubDetector()  # both passes consistent
    lm5b, _, _ = detect_lm5(
        det_ok, {}, jnp.asarray(img), detector_size=256,
        refine=True, nose_prior=W_bad,
    )
    # the agreeing pair's mean stays in the marker neighbourhood
    # (coarse ~marker+(0,5), refined ~marker+(0,1)); the poisoned prior
    # at (560, 560) never wins
    assert np.linalg.norm(np.asarray(lm5b)[0, 2] - marker) < 8.0


def test_detect_lm5_tta_picks_confident_pass_on_disagreement():
    """When the two passes disagree beyond the radius, TTA keeps the
    higher-confidence point — the far-off low-score nose of the direct
    pass loses to the mirrored pass's correct one."""
    size = 256
    img = np.zeros((1, size, size, 3), np.uint8)
    img[0, 100, 60, :] = 255
    det = _ContentStubDetector(sabotage_left=True)
    # without TTA the sabotaged nose wins
    lm5_plain, _, _ = detect_lm5(det, {}, jnp.asarray(img), detector_size=size)
    np.testing.assert_allclose(
        np.asarray(lm5_plain)[0, 2], [200.0, 30.0], atol=0.75
    )
    lm5, _, scores = detect_lm5(
        det, {}, jnp.asarray(img), detector_size=size, tta=True
    )
    np.testing.assert_allclose(
        np.asarray(lm5)[0, 2], [60.0, 110.0], atol=0.75
    )

"""Full-stack frontalization: raw image -> landmark detection
(pretrained MobileNetV2+SSD) -> landmark-centred patch crops -> the
two-pathway Generator — fused into on-device XLA programs.

The reference implies this flow but never connects it: Pretrain.py
trains the landmark detector, TestDataset consumes landmark strings from
annotation files (DataAndDataset.py:230-256), and nothing routes the
detector's predictions into the GAN. This module closes that loop the
TPU way: one jit program letterboxes the raw uint8 image, runs the
detector, decodes the four part coordinates with the fixed-shape masked
NMS, maps them back into the source frame, crops the patches, and runs
the Generator — a single dispatch from raw bytes to a frontal face.

Coordinate conventions: the detector was trained on letterboxed images
whose labels transform as ``xy * scale + pad`` (data/celeba.letterbox);
detection therefore unmaps with ``(xy - pad) / scale``. The detector's 4
parts are classes 0-3 = (left eye, right eye, nose, mouth MIDPOINT) in
the CelebA label order (mouth midpoint per the ``//2`` rule,
DataAndDataset.py:142-143); the patch cropper wants 5 points with two
mouth corners it averages back into a midpoint (DataAndDataset.py:42-43),
so the midpoint is duplicated into both corner slots — the average is
then exactly the detected point.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpgan_tpu.data.jit_preprocess import preprocess_for_synthesis_lm5
from tpgan_tpu.losses.decoder import decode_for_head_mode


def letterbox_batch(
    images: jnp.ndarray,  # (B, H, W, 3) uint8 or float in [0, 1]
    size: int,
    allow_upscale: bool = False,
) -> Tuple[jnp.ndarray, float, Tuple[int, int]]:
    """On-device aspect-preserving resize into a centred, zero-padded
    (size, size) square — the jit twin of data/celeba.letterbox (same
    geometry: ``scale = size / max(h, w)``, centred ``(size - new) // 2``
    pads, labels transform as ``xy * scale + pad``). H/W are static under
    jit, so scale and pads are Python scalars and every shape is static.

    ``allow_upscale=False`` matches bucketed pretraining (images smaller
    than the bucket are padded at native scale, celeba.CelebALandmark-
    Dataset bucket routing) — the frame the detector was trained in.
    """
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    scale = size / max(h, w)
    if not allow_upscale:
        scale = min(scale, 1.0)
    nh = max(int(round(h * scale)), 1)
    nw = max(int(round(w * scale)), 1)
    if (nh, nw) != (h, w):
        x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    pad_top = (size - nh) // 2
    pad_left = (size - nw) // 2
    x = jnp.pad(
        x,
        ((0, 0), (pad_top, size - nh - pad_top),
         (pad_left, size - nw - pad_left), (0, 0)),
    )
    return x, scale, (pad_left, pad_top)


def refine_lm5(
    detector,
    det_variables,
    images: jnp.ndarray,   # (B, H, W, 3) uint8 or float in [0, 1]
    pts: jnp.ndarray,      # (B, 4, 2) coarse source-frame part points
    scores: jnp.ndarray,   # (B, 4) coarse per-part confidence
    detector_size: int = 256,
    confidence_threshold: float = 0.0,
    zoom: float = 1.8,
    parts: Tuple[int, ...] = (2,),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Second-stage landmark refinement: re-detect inside a per-image
    zoom crop centred on the coarse face estimate, then map back.

    Round-4 analysis localised the serving-quality damage to a bimodal
    nose error (median 8.6 px but 15-17.5% of decodes >45 px,
    artifacts/detector_error_serving_r4.json) that the raw-geometry
    decode does not show (~0.06-0.09 tail for every checkpoint,
    artifacts/decode_sweep_r4.json): the letterboxed serving frame both
    shrinks the face below the detector's training distribution
    (160-320 px of frame) and multiplies detector-frame error by 1/scale
    on the way back. The refinement crop reverses both: the face fills
    the frame (in-distribution), and the map-back DIVIDES the error by
    the zoom factor.

    The crop geometry uses the eyes+mouth coarse points only — those
    parts are reliable (mean 6-9 px) while the nose owns the
    catastrophic tail, so a bad nose never displaces its own repair
    window. Per-image dynamic scale/translation ride
    ``jax.image.scale_and_translate`` under ``vmap`` — traced scalars
    with static output shapes, one fused XLA program, no host round
    trip. Cost: one extra detector forward (<2% of a synthesis
    program's FLOPs).

    Returns (refined points (B, 4, 2) source frame, scores (B, 4));
    parts whose refined confidence fails ``confidence_threshold`` keep
    the coarse estimate.

    ``parts`` selects WHICH part indices the refined pass may replace
    (default: nose only). The round-5 all-parts measurement
    (artifacts/detector_error_refine_allparts_r5.json) showed refine
    helping exactly the part that owns the tail (nose over-45px 0.175
    -> 0.10, p90 74 -> 34 px) while slightly hurting the already-good
    eyes (mean 9.2 -> 12.5 px, a fresh 0.0125 tail) — the coarse
    serving decode is the better estimator for parts that were never
    broken, so they keep it.
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    eyes_mouth = pts[:, jnp.asarray([0, 1, 3]), :]
    centre = eyes_mouth.mean(axis=1)                            # (B, 2) xy
    eye_d = jnp.linalg.norm(pts[:, 0] - pts[:, 1], axis=-1)
    em_d = jnp.linalg.norm(pts[:, :2].mean(axis=1) - pts[:, 3], axis=-1)
    half = jnp.maximum(jnp.maximum(eye_d, em_d) * zoom, 16.0)   # (B,)
    s = detector_size / (2.0 * half)                            # (B,)
    # label transform of the crop resample: out = s * in + t
    t = detector_size / 2.0 - centre * s[:, None]               # (B, 2) xy

    def crop_one(img, s_i, t_i):
        return jax.image.scale_and_translate(
            img, (detector_size, detector_size, 3), (0, 1, 2),
            jnp.asarray([s_i, s_i, 1.0]),
            # spatial_dims order (rows, cols, channel) = (y, x, c)
            jnp.asarray([t_i[1], t_i[0], 0.0]),
            method="linear",
        )

    boxed = jax.vmap(crop_one)(x, s, t)
    loc, cls = detector.apply(det_variables, boxed, train=False)
    decoded = decode_for_head_mode(
        getattr(detector, "head_mode", "absolute"), confidence_threshold
    )(loc, cls)
    rpts = decoded.points[:, :4, 0, :]
    rvalid = decoded.valid[:, :4, 0]
    rscores = decoded.scores[:, :4, 0]
    rpts = (rpts - t[:, None, :]) / s[:, None, None]
    part_mask = jnp.zeros((4,), bool).at[jnp.asarray(parts)].set(True)
    keep = rvalid & part_mask[None, :]
    return (
        jnp.where(keep[..., None], rpts, pts),
        jnp.where(keep, rscores, scores),
    )


def detect_lm5(
    detector,
    det_variables,
    images: jnp.ndarray,  # (B, H, W, 3) uint8 or float in [0, 1]
    detector_size: int = 256,
    confidence_threshold: float = 0.0,
    tta: bool = False,
    tta_agree_radius: float = 15.0,
    allow_upscale: bool = True,
    refine: bool = False,
    nose_prior=None,
    nose_gate_ratio: float = 0.35,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Detect the 4 part landmarks and expand to the 5-point synthesis
    convention. Returns (lm5 (B, 5, 2) source-frame pixels, valid (B, 4)
    per-part detection mask, scores (B, 4) per-part softmax confidence).
    ``confidence_threshold=0`` always commits to the best-scoring
    location per part (the serving choice — a face is assumed present);
    the scores let the caller flag low-confidence detections either way.

    ``tta=True`` adds horizontal-mirror test-time augmentation: ONE
    doubled-batch detector forward over [images, mirror(images)], the
    mirrored decode mapped back (x -> size-1-x, left/right eye classes
    swapped), then per part a score-weighted mean when the two passes
    agree within ``tta_agree_radius`` px (detector frame) and the
    higher-confidence point otherwise. Targets the rare far-off decode
    (the nose >45 px tail, artifacts/decode_sweep_r4.json) at the cost
    of 2x the DETECTOR forward only — cheap next to the generator.

    ``allow_upscale=True`` (default) letterboxes small inputs UP to the
    detector frame. The detector trains on faces filling 160-320 px of
    the frame (data_synth pretrain sizes), so a 128 px serving probe
    left at native scale is both out-of-distribution AND maps detector-
    frame error back 1:1; upscaled, the same error divides by the scale
    factor (2x for 128->256 — measured in
    artifacts/serving_scale_probe_r4.json).

    ``nose_prior`` (the (7, 2) ridge fit from
    train.pretrain.fit_nose_prior, shipped in detector_meta.json)
    enables the plausibility gate: the nose decode is bimodal (median
    8.6 px, but 10-17.5% of serving decodes land >45 px off — the
    single part owning the round-4 full-stack identity damage), so a
    nose further than ``nose_gate_ratio * eye_distance`` from the
    shape-prior prediction ``[le, re, mouth, 1] @ W`` snaps TO the
    prior. The gate only ever activates on decodes that are
    implausible under the training corpus' face geometry; inliers pass
    through untouched. Applied after TTA and refine (their fused
    estimates feed the prior's features).
    """
    boxed, scale, (pad_left, pad_top) = letterbox_batch(
        images, detector_size, allow_upscale=allow_upscale
    )
    det_in = (
        jnp.concatenate([boxed, boxed[:, :, ::-1, :]], axis=0)
        if tta else boxed
    )
    loc, cls = detector.apply(det_variables, det_in, train=False)
    # decode matches the head's parameterization (soft-top-k cluster for
    # anchor_offset checkpoints, reference NMS+top-1 otherwise)
    decoded = decode_for_head_mode(
        getattr(detector, "head_mode", "absolute"), confidence_threshold
    )(loc, cls)
    pts = decoded.points[:, :4, 0, :]  # classes 0-3 = parts; 4 = background
    valid = decoded.valid[:, :4, 0]
    scores = decoded.scores[:, :4, 0]
    if tta:
        b = boxed.shape[0]
        pts, pts_m = pts[:b], pts[b:]
        scores, scores_m = scores[:b], scores[b:]
        valid = valid[:b]
        # back to the unmirrored frame: x -> size-1-x (pixel centres),
        # and mirroring swaps the left/right eye classes
        pts_m = pts_m.at[..., 0].set(detector_size - 1 - pts_m[..., 0])
        swap = jnp.asarray([1, 0, 2, 3])
        pts_m, scores_m = pts_m[:, swap], scores_m[:, swap]
        d = jnp.sqrt(jnp.sum(jnp.square(pts - pts_m), axis=-1) + 1e-12)
        agree = (d <= tta_agree_radius)[..., None]
        wsum = (scores + scores_m)[..., None]
        fused = (
            pts * scores[..., None] + pts_m * scores_m[..., None]
        ) / jnp.maximum(wsum, 1e-12)
        pick = jnp.where((scores >= scores_m)[..., None], pts, pts_m)
        pts = jnp.where(agree, fused, pick)
        scores = jnp.maximum(scores, scores_m)
        valid = scores > confidence_threshold
    pad = jnp.asarray([pad_left, pad_top], jnp.float32)
    pts = (pts - pad[None, None, :]) / scale
    rmerged = rscores = None
    if refine:
        # second pass in a per-image zoom crop (see refine_lm5) —
        # targets the catastrophic nose tail the letterbox frame causes
        rmerged, rscores = refine_lm5(
            detector, det_variables, images, pts, scores,
            detector_size=detector_size,
            confidence_threshold=confidence_threshold,
        )
    if nose_prior is not None:
        W = jnp.asarray(nose_prior, jnp.float32)  # (7, 2)
        feats = jnp.concatenate(
            [pts[:, 0], pts[:, 1], pts[:, 3],
             jnp.ones((pts.shape[0], 1), pts.dtype)], axis=1
        )
        prior = feats @ W                                       # (B, 2)
        eye_d = jnp.linalg.norm(pts[:, 0] - pts[:, 1], axis=-1)
        gate = nose_gate_ratio * jnp.maximum(eye_d, 16.0)
        if refine:
            # 3-way vote between ESTIMATORS WITH INDEPENDENT FAILURE
            # MODES: the first-pass decode (letterbox frame), the
            # zoom-crop re-detection, and the shape prior. Any snap/
            # fallback rule built on one estimator pair bottoms out at
            # their JOINT failure rate (~0.06-0.075 measured, offline
            # sweep on /tmp dumped decodes); pairwise agreement picks
            # whichever two of the three concur, so a single bad
            # estimate — bad decode, bad crop, or prior poisoned by
            # noisy eye/mouth features — never wins. Measured (80-image
            # val, TTA first pass): nose over-45px 0.175 -> 0.0375,
            # mean 25.5 -> 14.1 px.
            c, r = pts[:, 2], rmerged[:, 2]
            d_cr = jnp.linalg.norm(c - r, axis=-1)
            d_cp = jnp.linalg.norm(c - prior, axis=-1)
            d_rp = jnp.linalg.norm(r - prior, axis=-1)
            out = prior                         # no agreement anywhere
            out = jnp.where((d_cp <= gate)[:, None], c, out)
            out = jnp.where((d_rp <= gate)[:, None], r, out)
            out = jnp.where((d_cr <= gate)[:, None], (c + r) / 2, out)
            pts = pts.at[:, 2, :].set(out)
            scores = jnp.maximum(scores, rscores)
        else:
            # plausibility gate: an implausible decode snaps TO the
            # prior; inliers pass untouched
            off = jnp.linalg.norm(pts[:, 2] - prior, axis=-1)
            snap = (off > gate)[:, None]
            pts = pts.at[:, 2, :].set(jnp.where(snap, prior, pts[:, 2]))
    elif refine:
        pts, scores = rmerged, rscores
        valid = scores > confidence_threshold if confidence_threshold \
            else valid
    # 5-point form: mouth midpoint duplicated into both corner slots
    lm5 = jnp.concatenate([pts, pts[:, 3:4, :]], axis=1)
    return lm5, valid, scores


def make_frontalize_fn(
    cfg,
    detector,
    gen,
    detector_size: int = 256,
    tta: bool = False,
    allow_upscale: bool = True,
    refine: bool = False,
    nose_prior=None,
    nose_gate_ratio: float = 0.35,
    quant_scales=None,
    quant_rescale_dtype=None,
    quant_min_channels=None,
):
    """Build the fused raw-image -> frontal-face program.

    Returns ``fn(g_params, det_variables, images, z) -> (frontal
    (B, 128, 128, 3) in [-1, 1], lm5 (B, 5, 2), part_scores (B, 4))``;
    jit it (or let the first call cache per input shape). Both parameter
    sets are jit ARGUMENTS, never closed over: captured weights inline
    into the HLO as constants, which bloats the program and overflows
    remote-compile request limits on tunneled backends (the same hazard
    quant.calibrate_synthesis avoids).

    ``quant_scales`` (from ``ops.quant.calibrate_synthesis``) swaps the
    generator stage onto the int8 PTQ graph — the detector stays on the
    float path (it is <2% of the fused program's FLOPs, and its narrow
    depthwise convs are exactly the shapes the int8 variants probe showed
    losing to bf16); ``quant_rescale_dtype``/``quant_min_channels`` are
    the ops.quant.quant_config knobs.
    """
    from tpgan_tpu.train.gan_trainer import make_synthesize_fn

    detector = detector.clone(accum_f32=True)  # inference-only path
    if quant_scales is not None:
        from tpgan_tpu.ops.quant import make_int8_synthesize_fn

        int8_synthesize = make_int8_synthesize_fn(
            cfg, gen, quant_scales,
            rescale_dtype=quant_rescale_dtype,
            min_channels=quant_min_channels,
        )
        def synthesize(g_params, batch, z, batch_stats=None):
            if batch_stats:
                raise NotImplementedError(
                    "int8 PTQ synthesis does not thread BatchNorm "
                    "running stats (the default WGAN-GP generator has "
                    "no BN, config.py:68/72 parity)"
                )
            return int8_synthesize(g_params, batch, z)
    else:
        synthesize = make_synthesize_fn(cfg, gen)

    def frontalize(g_params, det_variables, images, z, batch_stats=None):
        lm5, _valid, scores = detect_lm5(
            detector, det_variables, images, detector_size=detector_size,
            tta=tta, allow_upscale=allow_upscale, refine=refine,
            nose_prior=nose_prior, nose_gate_ratio=nose_gate_ratio,
        )
        batch = preprocess_for_synthesis_lm5(images, lm5)
        fake = synthesize(g_params, batch, z, batch_stats=batch_stats)
        return fake, lm5, scores

    return frontalize

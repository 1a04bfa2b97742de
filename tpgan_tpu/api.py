"""High-level inference API: the full stack from raw images to
frontalized faces.

Chains the landmark detector (MobileNetV2+SSD, pretrained via
``cli pretrain``), the jit preprocessing pipeline, and the generator —
the complete replacement for a reference user's Pretrain.py +
TestDataset + Generator workflow, as one or two XLA dispatches.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from tpgan_tpu.data.patches import crop_patches_batch
from tpgan_tpu.losses.decoder import decode_for_head_mode
from tpgan_tpu.models.mobilenet_v2 import MobileNetV2


def landmarks5_from_detection(points4: jnp.ndarray) -> jnp.ndarray:
    """Detector output (B, 4, 2) [left eye, right eye, nose, mouth
    centre] -> the 5-point layout the crop geometry consumes (both mouth
    corners set to the centre, whose midpoint is then the centre itself —
    DataAndDataset.py:42-43)."""
    mouth = points4[:, 3:4, :]
    return jnp.concatenate([points4[:, :3, :], mouth, mouth], axis=1)


def detect_landmarks(
    detector_variables: Any,
    images: jnp.ndarray,  # (B, H, W, 3) float in [0, 1]
    confidence_threshold: float = 0.5,
    head_mode: str = "absolute",
):
    """Run the landmark detector; returns ((B, 4, 2) points in input
    pixel coordinates, (B, 4) validity mask). ``head_mode``: the
    checkpoint's SSD-head parameterization (train.pretrain.
    apply_detector_meta reads it from the checkpoint sidecar)."""
    model = MobileNetV2(head_mode=head_mode)
    loc, cls = model.apply(detector_variables, images)
    decoded = decode_for_head_mode(head_mode, confidence_threshold)(loc, cls)
    return decoded.points[:, :4, 0, :], decoded.valid[:, :4, 0]


def preprocess_from_landmarks5(
    images: jnp.ndarray, lm5_source: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """TestDataset preprocessing with 5-point landmarks already known
    (in source-image pixel coordinates)."""
    b, h, w, _ = images.shape
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    scale = jnp.asarray([128.0 / w, 128.0 / h], jnp.float32)
    lm5 = lm5_source.astype(jnp.float32) * scale[None, None, :]
    img128 = jnp.clip(
        jax.image.resize(x, (b, 128, 128, 3), method="lanczos3"), 0.0, 1.0
    )
    img64 = jnp.clip(
        jax.image.resize(img128, (b, 64, 64, 3), method="lanczos3"), 0.0, 1.0
    )
    img32 = jnp.clip(
        jax.image.resize(img64, (b, 32, 32, 3), method="lanczos3"), 0.0, 1.0
    )
    batch = {
        name: p * 2.0 - 1.0
        for name, p in crop_patches_batch(img128, lm5).items()
    }
    batch["img"] = img128 * 2.0 - 1.0
    batch["img64"] = img64 * 2.0 - 1.0
    batch["img32"] = img32 * 2.0 - 1.0
    return batch


def make_full_inference_fn(
    generator, detector_input_size: int = 256, head_mode: str = "absolute"
):
    """(g_params, detector_vars, raw images (B,H,W,3) in [0,1], z) ->
    frontalized (B, 128, 128, 3) in [-1, 1]. Landmarks are detected on a
    fixed-size copy and rescaled; everything jits as one program."""

    generator = generator.clone(accum_f32=True)  # inference: fast convs

    def infer(g_params, detector_variables, images, z):
        b, h, w, _ = images.shape
        s = detector_input_size
        det_in = jnp.clip(
            jax.image.resize(
                images.astype(jnp.float32), (b, s, s, 3), method="linear"
            ),
            0.0,
            1.0,
        )
        pts, _valid = detect_landmarks(
            detector_variables, det_in, head_mode=head_mode
        )
        # back to source coordinates
        pts = pts * jnp.asarray([w / s, h / s], jnp.float32)[None, None, :]
        lm5 = landmarks5_from_detection(pts)
        batch = preprocess_from_landmarks5(images, lm5)
        out = generator.apply(
            {"params": g_params},
            batch["img"], batch["left_eye"], batch["right_eye"],
            batch["nose"], batch["mouth"], z,
            use_dropout=False,
        )
        return out.img128_fake

    return infer

"""MobileNetV2 backbone + SSD-style landmark head
(reference: MobileNetV2.py:10-340).

Components:

* :class:`InvertedResidual` — expand(1x1,x6) -> depthwise(3x3) ->
  project(1x1), BN+ReLU6, residual add iff stride 1 and in == out
  (reference: MobileNetV2.py:81-120). The depthwise conv is expressed
  with ``feature_group_count`` so XLA lowers it natively.
* :class:`MobileNetV2` — stem conv (3->32, s2), 17 inverted residuals per
  the t/c/n/s table (:133-142), 1x1 conv to 1280, seven extra layers, and
  feature taps at bottleneck idx 12, after conv2, and extra idx {1,3,4,6}
  (:199-213). All weights use the reference's explicit He re-init
  (:220-250): conv N(0, sqrt(2/(k*k*out))) bias 0, BN (1, 0),
  Linear N(0, 0.01) bias 0.
* :class:`SSDHead` — per-scale 3x3 loc/cls conv pairs over the 6 tapped
  scales (in-ch 96/1280/512/256/256/128, anchors 4,6,6,6,6,6; :28-44).
  TPU note: we are already NHWC, so the reference's NCHW->NHWC permute
  before flattening (:63-72) is a plain reshape here, and the prediction
  ordering matches the reference exactly.
* :func:`find_best_coordinates` — the reference's helper of the same name
  (:290-340) indexes a 10-channel location tensor that the head never
  produces (dead code written for a different head); we provide the
  coherent equivalent: per-part top-1 decode via the jittable NMS decoder.

The forward accepts any spatial size that survives the stride pyramid;
the pretrain pipeline feeds a fixed bucket (config.pretrain.image_size)
so shapes stay static under jit.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tpgan_tpu.losses.decoder import DecodedLandmarks, decode_landmarks
from tpgan_tpu.ops import initializers as init_lib
from tpgan_tpu.ops.activations import RELU6, apply_activation
from tpgan_tpu.ops.blocks import BatchNorm2d, Conv2d

# t (expansion), c (out channels), n (repeats), s (first stride)
# (reference: MobileNetV2.py:133-142)
INVERTED_RESIDUAL_SETTING = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# 6 SSD feature scales: (input channels, anchors) (reference: :28-44)
SSD_SCALES = ((96, 4), (1280, 6), (512, 6), (256, 6), (256, 6), (128, 6))

NUM_LANDMARK_CLASSES = 5  # left eye, right eye, nose, mouth + background


def _he_conv(name_suffix=""):
    return dict(kernel_init=init_lib.he_ssd_conv(), bias_init=init_lib.zeros)


class InvertedResidual(nn.Module):
    inp: int
    oup: int
    stride: int = 1
    expand_ratio: int = 6
    dtype: Any = jnp.float32
    accum_f32: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.inp * self.expand_ratio
        h = Conv2d(
            self.inp, mid, 1, 1, 0, use_bias=False, dtype=self.dtype,
            accum_f32=self.accum_f32, name="expand", **_he_conv(),
        )(x)
        h = BatchNorm2d(mid, dtype=self.dtype, name="expand_bn")(h, train=train)
        h = apply_activation(h, RELU6)
        h = Conv2d(
            mid, mid, 3, self.stride, 1, use_bias=False, groups=mid,
            dtype=self.dtype, accum_f32=self.accum_f32, name="depthwise",
            **_he_conv(),
        )(h)
        h = BatchNorm2d(mid, dtype=self.dtype, name="depthwise_bn")(h, train=train)
        h = apply_activation(h, RELU6)
        h = Conv2d(
            mid, self.oup, 1, 1, 0, use_bias=False, dtype=self.dtype,
            accum_f32=self.accum_f32, name="project", **_he_conv(),
        )(h)
        h = BatchNorm2d(self.oup, dtype=self.dtype, name="project_bn")(h, train=train)
        if self.stride == 1 and self.inp == self.oup:
            return x + h
        return h


class SSDHead(nn.Module):
    """Per-scale loc/cls head. Two location parameterizations:

    * ``head_mode="absolute"`` — reference parity: the loc conv emits the
      landmark's ABSOLUTE pixel coordinate, ReLU-clamped
      (reference: MobileNetV2.py:67). Structural flaw (measured as the
      round-3 12 px localization ceiling): convolutions are translation-
      equivariant, so a conv head cannot represent "output the absolute
      position x" except by exploiting padding/boundary artifacts — the
      regression target is not in the head's function class.
    * ``head_mode="anchor_offset"`` — TPU-first redesign: each feature
      cell owns an anchor at its centre ``((j+0.5)*stride_x,
      (i+0.5)*stride_y)`` and the conv regresses the OFFSET from that
      centre in stride units: ``coord = centre + raw * stride``. The
      offset-to-target field is translation-equivariant, i.e. exactly
      representable by the conv; the decoded output stays an absolute
      pixel coordinate, so the multitask loss, the NMS decoder, and
      every checkpoint consumer are unchanged. Decoding is done in f32
      and clipped per-axis to the image bounds (the loss's [0, 1]
      normalisation clip, reference :471-475, then never engages).
    """

    num_of_out_classes: int = NUM_LANDMARK_CLASSES
    dtype: Any = jnp.float32
    accum_f32: bool = True
    head_mode: str = "absolute"

    @nn.compact
    def __call__(
        self,
        features: List[jnp.ndarray],
        image_hw: Tuple[int, int] | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        num_loc = 2  # (x, y) centre per anchor
        if self.head_mode not in ("absolute", "anchor_offset"):
            raise ValueError(f"unknown head_mode: {self.head_mode!r}")
        if self.head_mode == "anchor_offset" and image_hw is None:
            raise ValueError("anchor_offset head needs image_hw")
        locations, classifications = [], []
        for idx, (cin, anchors) in enumerate(SSD_SCALES):
            feat = features[idx]
            b = feat.shape[0]
            loc = Conv2d(
                cin, anchors * num_loc, 3, 1, 1, dtype=self.dtype,
                accum_f32=self.accum_f32, name=f"loc{idx}", **_he_conv(),
            )(feat)
            if self.head_mode == "anchor_offset":
                ih, iw = int(image_hw[0]), int(image_hw[1])
                fh, fw = int(feat.shape[1]), int(feat.shape[2])
                sy, sx = ih / fh, iw / fw  # pixel stride of this scale
                cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * sx
                cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * sy
                centres = jnp.stack(
                    jnp.broadcast_arrays(cx[None, :], cy[:, None]), axis=-1
                )  # (fh, fw, 2) as (x, y)
                raw = loc.astype(jnp.float32).reshape(b, fh, fw, anchors, num_loc)
                stride = jnp.asarray([sx, sy], jnp.float32)
                decoded = centres[None, :, :, None, :] + raw * stride
                hi = jnp.asarray([iw, ih], jnp.float32)
                loc = jnp.clip(decoded, 0.0, hi).reshape(b, -1, num_loc)
            else:
                # NHWC already — flatten straight to (B, H*W*anchors, 2);
                # ReLU keeps coordinates non-negative (reference: :67)
                loc = jnp.maximum(loc.reshape(b, -1, num_loc), 0.0)
            locations.append(loc)

            cls = Conv2d(
                cin, anchors * self.num_of_out_classes, 3, 1, 1,
                dtype=self.dtype, accum_f32=self.accum_f32,
                name=f"cls{idx}", **_he_conv(),
            )(feat)
            classifications.append(cls.reshape(b, -1, self.num_of_out_classes))

        return (
            jnp.concatenate(locations, axis=1),
            jnp.concatenate(classifications, axis=1),
        )


class MobileNetV2(nn.Module):
    num_of_out_classes: int = NUM_LANDMARK_CLASSES
    dtype: Any = jnp.float32
    accum_f32: bool = True  # False when training (grads through convs)
    head_mode: str = "absolute"  # see SSDHead; config: pretrain.head_mode

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, use_dropout: bool = False, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        del use_dropout  # accepted-and-ignored, as in the reference (:189)
        features = []

        h = Conv2d(
            3, 32, 3, 2, 1, use_bias=False, dtype=self.dtype,
            accum_f32=self.accum_f32, name="stem", **_he_conv(),
        )(x)
        h = BatchNorm2d(32, dtype=self.dtype, name="stem_bn")(h, train=train)
        h = apply_activation(h, RELU6)

        cin = 32
        block_idx = 0
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            for rep in range(n):
                h = InvertedResidual(
                    cin, c, s if rep == 0 else 1, t, dtype=self.dtype,
                    accum_f32=self.accum_f32, name=f"block{block_idx}",
                )(h, train=train)
                cin = c
                if block_idx == 12:  # first SSD tap (reference: :199-201)
                    features.append(h)
                block_idx += 1

        h = Conv2d(
            320, 1280, 1, 1, 0, use_bias=False, dtype=self.dtype,
            accum_f32=self.accum_f32, name="conv2", **_he_conv(),
        )(h)
        h = BatchNorm2d(1280, dtype=self.dtype, name="conv2_bn")(h, train=train)
        h = apply_activation(h, RELU6)
        features.append(h)

        # extra pyramid (reference: :177-185): (cin, cout, k, s, p), taps
        # after idx 1, 3, 4, 6
        extra_defs = [
            (1280, 512, 1, 1, 0),
            (512, 512, 3, 2, 1),
            (512, 256, 1, 1, 0),
            (256, 256, 3, 2, 1),
            (256, 256, 3, 2, 1),
            (256, 128, 1, 1, 0),
            (128, 128, 3, 2, 1),
        ]
        for i, (ci, co, k, s, p) in enumerate(extra_defs):
            h = Conv2d(
                ci, co, k, s, p, dtype=self.dtype, accum_f32=self.accum_f32,
                name=f"extra{i}", **_he_conv()
            )(h)
            if i in (1, 3, 4, 6):
                features.append(h)

        return SSDHead(
            self.num_of_out_classes, dtype=self.dtype,
            accum_f32=self.accum_f32, head_mode=self.head_mode,
            name="ssd_head",
        )(features, image_hw=(x.shape[1], x.shape[2]))


def anchor_centres(image_hw) -> jnp.ndarray:
    """The (N, 2) anchor-centre grid in the SSD head's concatenation
    order — per scale, (i, j, anchor) row-major, (x, y) pixel pairs.
    Matches the anchor_offset decode exactly (tested: the head emits
    this grid verbatim when its loc convs are zeroed).

    Used by the anchor-based positive assignment in the multitask loss:
    with head_mode=anchor_offset, "which anchors are positive" must be a
    STATIC property of the grid, not of the moving predictions — the
    decode commits to the argmax-score anchor, so classification has to
    reward exactly the near-GT cells whose offsets regress best.
    """
    ih, iw = int(image_hw[0]), int(image_hw[1])

    def down(v, n):
        for _ in range(n):
            v = (v + 1) // 2  # every downsample in the pyramid is k3 s2 p1
        return v

    # tap strides: block12 /16, conv2 /32, extra1 /64, extra3 /128,
    # extra4 /256, extra6 /512 (reference taps MobileNetV2.py:199-213)
    rows = []
    for n_down, (_, anchors) in zip((4, 5, 6, 7, 8, 9), SSD_SCALES):
        fh, fw = down(ih, n_down), down(iw, n_down)
        sy, sx = ih / fh, iw / fw
        cx = (jnp.arange(fw, dtype=jnp.float32) + 0.5) * sx
        cy = (jnp.arange(fh, dtype=jnp.float32) + 0.5) * sy
        grid = jnp.stack(
            jnp.broadcast_arrays(cx[None, :], cy[:, None]), axis=-1
        )  # (fh, fw, 2)
        rows.append(
            jnp.broadcast_to(
                grid[:, :, None, :], (fh, fw, anchors, 2)
            ).reshape(-1, 2)
        )
    return jnp.concatenate(rows, axis=0)


def find_best_coordinates(
    locations: jnp.ndarray,
    classifications: jnp.ndarray,
    distance_threshold: float = 15.0,
) -> DecodedLandmarks:
    """Best per-part coordinate via NMS + top-1 decode — the working
    equivalent of the reference's dead-code helper (MobileNetV2.py:290-340,
    which indexes a 10-channel location tensor the head never emits)."""
    return decode_landmarks(
        locations,
        classifications,
        confidence_threshold=0.0,
        top_k=1,
        nms_distance_threshold=distance_threshold,
    )

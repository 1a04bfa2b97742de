"""Landmark decoder — confidence threshold + greedy distance-NMS + top-k,
re-expressed as fixed-shape masked ops so it jits
(reference: MultiTaskDecoder, MobileNetV2.py:536-649, whose NMS is a
data-dependent Python while-loop, SURVEY.md §3.5).

The greedy NMS becomes a bounded ``fori_loop`` over ``max_keep``
iterations: each iteration takes the highest-score surviving candidate,
records it, and suppresses everything within the distance threshold.
Results come back as dense (num_classes, top_k) arrays with a validity
mask instead of ragged Python lists.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class DecodedLandmarks(NamedTuple):
    points: jnp.ndarray  # (B, C, top_k, 2)
    scores: jnp.ndarray  # (B, C, top_k)
    valid: jnp.ndarray   # (B, C, top_k) bool


def masked_nms(
    points: jnp.ndarray,  # (N, 2)
    scores: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,   # (N,) bool
    distance_threshold: float,
    max_keep: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy distance-NMS (MobileNetV2.py:599-636) with static shapes.

    Returns (kept_points (max_keep, 2), kept_scores (max_keep,),
    kept_valid (max_keep,)) ordered by descending score."""
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(i, carry):
        alive, kp, ks, kv = carry
        s = jnp.where(alive, scores, neg_inf)
        idx = jnp.argmax(s)
        found = s[idx] > neg_inf
        kp = kp.at[i].set(jnp.where(found, points[idx], 0.0))
        ks = ks.at[i].set(jnp.where(found, scores[idx], 0.0))
        kv = kv.at[i].set(found)
        dist = jnp.sqrt(
            jnp.sum(jnp.square(points - points[idx]), axis=-1) + 1e-20
        )
        suppress = dist <= distance_threshold  # includes idx itself
        alive = alive & jnp.where(found, ~suppress, alive)
        return alive, kp, ks, kv

    init = (
        valid,
        jnp.zeros((max_keep, 2), points.dtype),
        jnp.zeros((max_keep,), scores.dtype),
        jnp.zeros((max_keep,), bool),
    )
    _, kp, ks, kv = lax.fori_loop(0, max_keep, body, init)
    return kp, ks, kv


def _decode_one(
    locations: jnp.ndarray,  # (N, 2)
    classifications: jnp.ndarray,  # (N, C)
    *,
    confidence_threshold: float,
    top_k: int,
    nms_distance_threshold: float,
):
    scores = jax.nn.softmax(classifications.astype(jnp.float32), axis=-1)  # (N, C)

    def per_class(class_scores):
        valid = class_scores > confidence_threshold
        return masked_nms(
            locations.astype(jnp.float32),
            class_scores,
            valid,
            nms_distance_threshold,
            top_k,
        )

    return jax.vmap(per_class)(scores.T)  # over classes


def decode_landmarks(
    locations: jnp.ndarray,  # (B, N, 2)
    classifications: jnp.ndarray,  # (B, N, C)
    confidence_threshold: float = 0.5,
    top_k: int = 1,
    nms_distance_threshold: float = 20.0,
) -> DecodedLandmarks:
    """Batched decode. Defaults mirror MultiTaskDecoder.__init__
    (MobileNetV2.py:537). With top_k=1 this reduces to a thresholded
    per-class argmax — exactly what the reference's threshold+NMS+top-1
    computes, since greedy NMS keeps the global maximum first."""
    fn = partial(
        _decode_one,
        confidence_threshold=confidence_threshold,
        top_k=top_k,
        nms_distance_threshold=nms_distance_threshold,
    )
    kp, ks, kv = jax.vmap(fn)(locations, classifications)
    return DecodedLandmarks(points=kp, scores=ks, valid=kv)

"""Serving export: ahead-of-time compile and portable StableHLO
serialisation of the synthesis function.

``jax.export`` captures the jitted generator forward (optionally with the
on-device preprocessing fused in) as a versioned StableHLO artifact that
a serving binary can load and run without Python tracing — the
productionisation step the reference (research scripts only) never had.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tpgan_tpu.config import Config
from tpgan_tpu.train.gan_trainer import make_synthesize_fn


def cast_float_leaves(tree, dtype):
    """Cast every floating-point leaf of a param pytree to ``dtype``.

    Used to bake bf16 weight constants into serving artifacts: the bf16
    compute path casts conv/linear kernels to bf16 at use anyway
    (ops/blocks.py ``kernel.astype(self.dtype)``), so baking them as
    bf16 halves the artifact with bit-identical matmuls; only epilogue
    params that participate in f32 arithmetic (BN scale/bias) lose their
    extra mantissa bits — sub-1e-2 output deltas, measured in
    tests/test_serving.py."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def _example_inputs(cfg: Config, batch: int):
    z = lambda *s: jnp.zeros(s, jnp.float32)
    example = {
        "img": z(batch, 128, 128, 3),
        "left_eye": z(batch, 40, 40, 3),
        "right_eye": z(batch, 40, 40, 3),
        "nose": z(batch, 32, 40, 3),
        "mouth": z(batch, 32, 48, 3),
    }
    return example, z(batch, cfg.G.zdim)


def export_synthesis(
    cfg: Config, gen, g_params, path: str, batch: int = 8,
    quant_scales=None, platforms: Optional[Tuple[str, ...]] = None,
    rescale_dtype=None, min_channels: Optional[int] = None,
    weights_dtype=None,
) -> None:
    """Serialise the synthesis function (params baked in) to ``path``.

    With ``quant_scales`` (from ``ops.quant.calibrate_synthesis``), the
    exported program is the int8 PTQ graph — weight quantisation folds
    into the artifact, so the serving binary runs int8 MXU convs with no
    Python-side quantisation step.

    ``platforms``: lowering targets baked into the artifact (e.g.
    ``("cpu", "tpu")``). A StableHLO export is otherwise pinned to the
    exporting backend — an artifact built next to the training chips
    would refuse to load on a CPU canary host and vice versa; none of
    the targets need to be attached at export time.

    ``weights_dtype`` (e.g. ``jnp.bfloat16``): bake the float weight
    constants at a narrower dtype — halves the artifact on bf16 models
    (see ``cast_float_leaves``). Ignored on the int8 path, where the
    per-channel quantisation must see the full-precision weights and the
    folded constants are int8 already."""
    from jax import export as jexport

    if weights_dtype is not None and quant_scales is None:
        g_params = cast_float_leaves(g_params, weights_dtype)
    if quant_scales is not None:
        from tpgan_tpu.ops.quant import make_int8_synthesize_fn

        # rescale_dtype / min_channels: the int8 serving-tuning knobs
        # (ops/quant.quant_config) bake into the artifact like the scales
        synthesize = make_int8_synthesize_fn(
            cfg, gen, quant_scales,
            rescale_dtype=rescale_dtype, min_channels=min_channels,
        )
    else:
        synthesize = make_synthesize_fn(cfg, gen)
    example, z = _example_inputs(cfg, batch)

    def fn(batch_in, z_in):
        return synthesize(g_params, batch_in, z_in)

    exported = jexport.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(example, z)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def export_frontalize(
    cfg: Config, detector, det_variables, gen, g_params, path: str,
    batch: int = 8, input_hw: Tuple[int, int] = (128, 128),
    detector_size: int = 256, tta: bool = False,
    allow_upscale: bool = True, refine: bool = False,
    nose_prior=None,
    platforms: Optional[Tuple[str, ...]] = None,
    quant_scales=None, rescale_dtype=None,
    min_channels: Optional[int] = None,
    weights_dtype=None,
) -> None:
    """Serialise the FULL-STACK program — raw uint8 image -> letterbox
    -> landmark detector -> decode -> patch crops -> generator ->
    frontal face — as one StableHLO artifact with both parameter sets
    baked in. The serving binary feeds camera bytes and gets faces:
    no landmark annotations, no Python, one dispatch (the deployment
    the reference's research scripts never reached; its closest path
    is the manual TestDataset annotation flow, DataAndDataset.py:230).

    ``input_hw`` is baked static (XLA static shapes); export one
    artifact per supported camera resolution, or letterbox host-side
    to a canonical size first. Returns (frontal [-1,1], lm5 source-
    frame px, per-part confidence scores).

    ``quant_scales`` exports the generator stage as the int8 PTQ graph
    (detector stays float — see ``make_frontalize_fn``); ``weights_dtype``
    narrows the baked float constants (detector params and, unless
    quantised, generator params; BatchNorm running stats stay f32 —
    they feed f32 normalisation arithmetic, ops/blocks.py:435)."""
    from jax import export as jexport

    from tpgan_tpu.frontalize import make_frontalize_fn

    if weights_dtype is not None:
        if quant_scales is None:
            g_params = cast_float_leaves(g_params, weights_dtype)
        det_variables = dict(det_variables)
        det_variables["params"] = cast_float_leaves(
            det_variables["params"], weights_dtype
        )
    frontalize = make_frontalize_fn(
        cfg, detector, gen, detector_size=detector_size, tta=tta,
        allow_upscale=allow_upscale, refine=refine,
        nose_prior=nose_prior,
        quant_scales=quant_scales,
        quant_rescale_dtype=rescale_dtype,
        quant_min_channels=min_channels,
    )

    def fn(images, z_in):
        return frontalize(g_params, det_variables, images, z_in)

    h, w = input_hw
    example = jnp.zeros((batch, h, w, 3), jnp.uint8)
    z = jnp.zeros((batch, cfg.G.zdim), jnp.float32)
    exported = jexport.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(example, z)
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_synthesis(path: str):
    """Load a serialized synthesis artifact; returns a callable
    (batch dict, z) -> frontal images."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def aot_compile_synthesis(cfg: Config, gen, g_params, batch: int = 8):
    """Ahead-of-time compile for the current backend; returns the
    compiled executable (first real request pays no trace/compile)."""
    synthesize = make_synthesize_fn(cfg, gen)
    example, z = _example_inputs(cfg, batch)
    return (
        jax.jit(synthesize)
        .lower(g_params, example, z)
        .compile()
    )

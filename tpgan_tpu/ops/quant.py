"""Post-training int8 quantization (PTQ) for the synthesis graph.

The TPU v5e MXU has 2x int8 peak over bf16 (measured on this chip:
+32-59% delivered TOP/s, docs/BENCHMARKS.md round 1). This module makes
the serving path use it:

* **per-output-channel symmetric weight quantization** — computed from
  the float32 params at trace time (no separate quantized checkpoint; XLA
  hoists/folds the rounding where profitable, and weight-prep cost is
  negligible next to the convs);
* **calibrated per-tensor activation scales** — a calibration pass runs
  the float graph over representative batches and records the running
  absmax of every conv/deconv input in a ``quant`` flax collection
  (``x_absmax`` variables, maximum-reduced across batches);
* **int8 x int8 -> int32 MXU convs** — inputs are quantized with the
  calibrated scale, the conv accumulates in int32, and the result is
  rescaled by ``x_scale * w_scale[channel]`` in float.

The mode is a TRACE-TIME context (``quant_mode``): model definitions are
untouched — ``Conv2d``/``ConvTranspose2d`` consult the active mode when
they trace, so one set of float params serves the float, calibration, and
int8 programs. Usage::

    scales = calibrate_synthesis(cfg, gen, g_params, batches)
    fn = make_int8_synthesize_fn(cfg, gen, scales)   # jit and serve
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any, Dict, Iterable, Optional

import numpy as np

import jax
import jax.numpy as jnp

_state = threading.local()

CALIB = "calib"
INT8 = "int8"

# int8 serving-tuning knob defaults (see quant_config)
_DEFAULT_RESCALE_DTYPE = jnp.float32
_DEFAULT_MIN_CHANNELS = 0


def current_mode() -> Optional[str]:
    return getattr(_state, "mode", None)


def rescale_dtype():
    return getattr(_state, "rescale_dtype", _DEFAULT_RESCALE_DTYPE)


def should_quantize(cin_per_group: int, cout: int) -> bool:
    """Selective quantization: convs narrower than ``min_channels`` on
    either side stay on the bf16 path. Rationale: a narrow conv is
    HBM-bound, so the int8 MXU rate buys little, while its quantize /
    dequantize epilogues still cost VPU cycles and an extra int32
    round-trip — measured on-chip by examples/int8_variants_probe.py."""
    m = getattr(_state, "min_channels", _DEFAULT_MIN_CHANNELS)
    return min(int(cin_per_group), int(cout)) >= m


@contextmanager
def quant_config(
    rescale_dtype: Any = None, min_channels: Optional[int] = None
):
    """Tune the int8 trace (wrap it together with ``quant_mode``):

    * ``rescale_dtype`` — dtype of the dequantize epilogue arithmetic
      (int32 accumulator -> float). bfloat16 halves the epilogue's
      read/write traffic; float32 is the conservative default.
    * ``min_channels`` — skip quantization for convs whose
      min(cin/groups, cout) is below this (see ``should_quantize``).
    """
    prev = (
        getattr(_state, "rescale_dtype", _DEFAULT_RESCALE_DTYPE),
        getattr(_state, "min_channels", _DEFAULT_MIN_CHANNELS),
    )
    if rescale_dtype is not None:
        _state.rescale_dtype = rescale_dtype
    if min_channels is not None:
        _state.min_channels = min_channels
    try:
        yield
    finally:
        _state.rescale_dtype, _state.min_channels = prev


@contextmanager
def quant_mode(mode: Optional[str]):
    """Activate a quantization mode for every conv TRACED inside the
    block. Must wrap the ``Module.apply`` call (under jit, the function
    body runs at trace time, so wrapping inside the jitted function is
    correct)."""
    if mode not in (None, CALIB, INT8):
        raise ValueError(f"unknown quant mode {mode!r}")
    prev = current_mode()
    _state.mode = mode
    try:
        yield
    finally:
        _state.mode = prev


def quantize_weight_per_channel(w: jnp.ndarray):
    """Symmetric per-output-channel int8 quantization of an HWIO (or
    (kh, kw, in, out)) kernel. Returns (w_q int8, w_scale float32 (out,))."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return w_q.astype(jnp.int8), scale


def quantize_activation(x: jnp.ndarray, absmax: jnp.ndarray):
    """Symmetric per-tensor int8 quantization with a calibrated absmax."""
    scale = jnp.maximum(absmax.astype(jnp.float32), 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def observe(module, x: jnp.ndarray) -> None:
    """Calibration hook: track the running absmax of ``x`` in the
    module's ``quant`` collection."""
    absmax = module.variable(
        "quant", "x_absmax", lambda: jnp.zeros((), jnp.float32)
    )
    if not module.is_initializing():
        absmax.value = jnp.maximum(
            absmax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
        )


def stored_absmax(module) -> jnp.ndarray:
    """Int8-inference hook: read the calibrated absmax for this conv."""
    v = module.variable("quant", "x_absmax", lambda: jnp.zeros((), jnp.float32))
    return v.value


def int8_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    absmax: jnp.ndarray,
    *,
    window_strides,
    padding,
    dimension_numbers,
    feature_group_count: int = 1,
    lhs_dilation=None,
) -> jnp.ndarray:
    """int8 x int8 -> int32 conv on the MXU, rescaled to float32 by the
    calibrated activation scale and the per-channel weight scale."""
    from jax import lax

    w_q, w_scale = quantize_weight_per_channel(kernel)
    x_q, x_scale = quantize_activation(x, absmax)
    y = lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=window_strides,
        padding=padding,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        lhs_dilation=lhs_dilation,
        preferred_element_type=jnp.int32,
    )
    rdt = rescale_dtype()
    return y.astype(rdt) * (x_scale * w_scale).astype(rdt)


# --------------------------------------------------------------------------
# Synthesis-graph drivers
# --------------------------------------------------------------------------

def calibrate_synthesis(
    cfg, gen, g_params, batches: Iterable[Dict[str, Any]], zs=None,
) -> Dict[str, Any]:
    """Run the float synthesis graph over ``batches`` recording activation
    absmax per conv. Returns the ``quant`` collection (a pytree of
    scalars keyed by module path) for ``make_int8_synthesize_fn``.

    ``batches``: iterable of TrainDataset-contract dicts (only the five
    synthesis inputs are used). ``zs``: optional matching iterable of
    noise vectors (defaults to PRNG-derived)."""
    gen = gen.clone(accum_f32=True)

    @jax.jit
    def calib_step(params, qvars, batch, z):
        # params is an ARGUMENT, not a closure capture: closed-over
        # weights inline into the HLO as constants (tens of MB), which
        # both bloats every compile and overflows request-size limits on
        # remoted-compile backends
        with quant_mode(CALIB):
            _, mut = gen.apply(
                {"params": params, "quant": qvars},
                batch["img"], batch["left_eye"], batch["right_eye"],
                batch["nose"], batch["mouth"], z,
                use_dropout=False,
                mutable=["quant"],
            )
        return mut["quant"]

    qvars: Dict[str, Any] = {}
    rng = jax.random.PRNGKey(0)
    zs_iter = iter(zs) if zs is not None else None
    for batch in batches:
        b = batch["img"].shape[0]
        if zs_iter is not None:
            z = next(zs_iter)
        else:
            rng, zr = jax.random.split(rng)
            z = jax.random.normal(zr, (b, cfg.G.zdim))
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k in ("img", "left_eye", "right_eye", "nose", "mouth")}
        if not qvars:
            # first batch creates the collection (unjitted trace would
            # also work; one extra compile is fine)
            with quant_mode(CALIB):
                _, mut = gen.apply(
                    {"params": g_params},
                    jb["img"], jb["left_eye"], jb["right_eye"],
                    jb["nose"], jb["mouth"], z,
                    use_dropout=False,
                    mutable=["quant"],
                )
            qvars = mut["quant"]
        else:
            qvars = calib_step(g_params, qvars, jb, z)
    return jax.device_get(qvars)


def make_int8_synthesize_fn(
    cfg, gen, quant_scales: Dict[str, Any],
    rescale_dtype: Any = None, min_channels: Optional[int] = None,
):
    """Int8 twin of ``train.gan_trainer.make_synthesize_fn``: same
    signature (g_params, batch, z) -> frontal images, convs running
    int8 x int8 -> int32 on the MXU with the calibrated scales baked in.
    ``rescale_dtype``/``min_channels``: see ``quant_config`` (measured
    on-chip by examples/int8_variants_probe.py)."""
    gen = gen.clone(accum_f32=True)

    def synthesize(g_params, batch, z):
        with quant_mode(INT8), quant_config(rescale_dtype, min_channels):
            out = gen.apply(
                {"params": g_params, "quant": quant_scales},
                batch["img"], batch["left_eye"], batch["right_eye"],
                batch["nose"], batch["mouth"], z,
                use_dropout=False,
            )
        return out.img128_fake

    return synthesize

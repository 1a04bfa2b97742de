"""Hand-written Pallas TPU kernels for the ops XLA's fuser does not
handle as a single pass.

Where Pallas is and is NOT used (the performance rationale):

* Convolutions/matmuls — NOT Pallas. XLA lowers them straight onto the
  MXU with its own tiling/pipelining; a hand kernel cannot beat it and
  bias/BN/LeakyReLU epilogues are fused by XLA automatically.
* The LocalFuser scatter-max (reference: D_and_G_model.py:148-159) — a
  Pallas kernel. The jnp formulation materialises four zero-padded
  128x128xC canvases in HBM before reducing; the kernel writes the canvas
  once per image, VMEM-resident, reading each part exactly once
  (~5x less HBM traffic for the feature-map fuse).
* The symmetry + total-variation reduction — a Pallas kernel computing
  both in one pass over the image instead of three separate elementwise
  reads.

All kernels carry jnp reference implementations (used on non-TPU
backends and as the custom-VJP backward), and correctness tests compare
the two in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from tpgan_tpu.ops.geometry import CANVAS_SIZE, PART_GEOMETRY, PART_NAMES

try:  # pallas import is TPU/CPU-interpret capable; guard for safety
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _geometry():
    return [PART_GEOMETRY[name] for name in PART_NAMES]


def _make_fuse_kernel(c: int):
    def kernel(le_ref, re_ref, no_ref, mo_ref, out_ref):
        """One grid step per batch element: zero the canvas, then
        max-blend each part into its static slot. Channels are folded
        into the lane dimension ((H, W*C) blocks) so small channel
        counts don't pad to 128 lanes; per-pixel channel contiguity
        makes every slot a static contiguous slice."""
        out_ref[...] = jnp.zeros_like(out_ref)
        refs = (le_ref, re_ref, no_ref, mo_ref)
        for ref, ((h, w), (top, left)) in zip(refs, _geometry()):
            cur = out_ref[0, top : top + h, left * c : (left + w) * c]
            out_ref[0, top : top + h, left * c : (left + w) * c] = jnp.maximum(
                cur, ref[0]
            )

    return kernel


def _fuse_pallas_raw(le, re, no, mo, *, interpret: bool):
    b = le.shape[0]
    c = le.shape[-1]
    dtype = le.dtype

    def part_spec(h, w):
        return pl.BlockSpec(
            (1, h, w * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )

    specs = [part_spec(h, w) for (h, w), _ in _geometry()]
    flat = [
        p.reshape(b, p.shape[1], p.shape[2] * c) for p in (le, re, no, mo)
    ]
    out = pl.pallas_call(
        _make_fuse_kernel(c),
        grid=(b,),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, CANVAS_SIZE, CANVAS_SIZE * c),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, CANVAS_SIZE, CANVAS_SIZE * c), dtype),
        interpret=interpret,
    )(*flat)
    return out.reshape(b, CANVAS_SIZE, CANVAS_SIZE, c)


def _fuse_jnp(le, re, no, mo):
    out = None
    for part, ((h, w), (top, left)) in zip((le, re, no, mo), _geometry()):
        placed = jnp.pad(
            part,
            ((0, 0), (top, CANVAS_SIZE - top - h),
             (left, CANVAS_SIZE - left - w), (0, 0)),
        )
        out = placed if out is None else jnp.maximum(out, placed)
    return out


@jax.custom_vjp
def fuse_parts_pallas(le, re, no, mo):
    """Scatter-max part fusion (Pallas on TPU, jnp elsewhere)."""
    if _HAS_PALLAS and jax.default_backend() == "tpu":
        return _fuse_pallas_raw(le, re, no, mo, interpret=False)
    return _fuse_jnp(le, re, no, mo)


def _fuse_fwd(le, re, no, mo):
    out = fuse_parts_pallas(le, re, no, mo)
    return out, (le, re, no, mo, out)


def _fuse_bwd(res, g):
    """Max gradient: each part slot receives the cotangent where that
    part attained the max (ties share, matching jnp.maximum chains
    closely enough for training)."""
    le, re, no, mo, out = res
    parts = (le, re, no, mo)
    grads = []
    for part, ((h, w), (top, left)) in zip(parts, _geometry()):
        out_slice = out[:, top : top + h, left : left + w, :]
        g_slice = g[:, top : top + h, left : left + w, :]
        grads.append(jnp.where(part >= out_slice, g_slice, 0.0).astype(part.dtype))
    return tuple(grads)


fuse_parts_pallas.defvjp(_fuse_fwd, _fuse_bwd)


def fuse_parts_pallas_interpret(le, re, no, mo):
    """Interpreter-mode entry for correctness tests on CPU."""
    return _fuse_pallas_raw(le, re, no, mo, interpret=True)


# --------------------------------------------------------------------------
# fused symmetry + total-variation reduction
# --------------------------------------------------------------------------

def _make_sym_tv_kernel(c: int):
    def kernel(x_ref, xf_ref, out_ref):
        """One pass over a (1, H, W*C) image block (channels folded into
        the lane dimension — a raw (H, W, C=3) block would pad C to 128
        lanes and blow the VMEM budget 42x). The width-mirrored copy
        arrives as a second input (Pallas TPU has no `rev` lowering).
        With channels folded, the width shift for TV is a shift by C
        along the flattened axis. Accumulated across the batch grid —
        TPU grid steps run sequentially, so the read-modify-write on the
        output block is race-free."""
        i = pl.program_id(0)
        x = x_ref[0].astype(jnp.float32)
        xf = xf_ref[0].astype(jnp.float32)

        sym = jnp.sum(jnp.abs(x - xf))
        tv_h = jnp.sum(jnp.abs(x[1:, :] - x[:-1, :]))
        tv_w = jnp.sum(jnp.abs(x[:, c:] - x[:, :-c]))
        vals = jnp.stack([sym, tv_h, tv_w]).reshape(1, 3)

        @pl.when(i == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        out_ref[...] += vals

    return kernel


def _sym_tv_sums_raw(x, *, interpret: bool):
    b, h, w, c = x.shape
    x2 = x.reshape(b, h, w * c)
    xf2 = jnp.flip(x, axis=2).reshape(b, h, w * c)
    spec = pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_sym_tv_kernel(c),
        grid=(b,),
        in_specs=[spec, spec],
        out_specs=pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 3), jnp.float32),
        interpret=interpret,
    )(x2, xf2)


def _sym_tv_jnp(x) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    sym = jnp.sum(jnp.abs(x - jnp.flip(x, axis=2)))
    tv_h = jnp.sum(jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :]))
    tv_w = jnp.sum(jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :]))
    return jnp.stack([sym, tv_h, tv_w]).reshape(1, 3)


def _sym_tv_pair_jnp(x) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, w, c = x.shape
    sums = _sym_tv_jnp(x)
    n = b * h * w * c
    sym = sums[0, 0] / n
    tv = sums[0, 1] / (b * (h - 1) * w * c) + sums[0, 2] / (b * h * (w - 1) * c)
    return sym, tv


@jax.custom_vjp
def symmetry_tv_losses(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(symmetry_loss, tv_loss) with the reference normalisations
    (mean abs for both; see tpgan_tpu.losses.pixel), computed in one
    fused pass on TPU. Backward is the analytic jnp gradient (elementwise
    signs — XLA fuses it into the surrounding backward pass)."""
    b, h, w, c = x.shape
    if _HAS_PALLAS and jax.default_backend() == "tpu":
        sums = _sym_tv_sums_raw(x, interpret=False)
        n = b * h * w * c
        sym = sums[0, 0] / n
        tv = sums[0, 1] / (b * (h - 1) * w * c) + sums[0, 2] / (b * h * (w - 1) * c)
        return sym, tv
    return _sym_tv_pair_jnp(x)


# --------------------------------------------------------------------------
# conv3x3 + bias + LeakyReLU epilogue prototype (A/B vs XLA fusion)
# --------------------------------------------------------------------------
#
# The north-star wording asked for "fused Pallas conv+BN+LeakyReLU"; round
# 1 argued (for the scatter-max fuser) that XLA already fuses conv
# epilogues and a hand conv can't beat its MXU pipeline. This kernel is
# the MEASURED version of that argument for the conv path: a 3x3 stride-1
# SAME conv with the bias+LeakyReLU epilogue fused in VMEM, expressed as
# nine shifted (H*W, Cin) x (Cin, Cout) MXU matmuls per image. The A/B
# against XLA's conv+epilogue on the chip is recorded in
# docs/BENCHMARKS.md; the kernel is NOT wired into the models unless it
# wins (it exists as evidence, not decoration).

def _make_conv3x3_kernel(h: int, w: int, cin: int, cout: int,
                         negative_slope: float):
    def kernel(x_ref, w_ref, b_ref, out_ref):
        """x_ref: (1, h+2, w+2, cin) padded input block (VMEM);
        w_ref: (3, 3, cin, cout); b_ref: (1, cout);
        out_ref: (1, h, w, cout). The (H, W, C) -> (H*W, C) reshapes keep
        the lane (channel) dimension, the layout Mosaic relayouts
        cheaply."""
        acc = jnp.zeros((h * w, cout), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                win = x_ref[0, dh : dh + h, dw : dw + w, :]
                acc += jax.lax.dot(
                    win.reshape(h * w, cin),
                    w_ref[dh, dw],
                    preferred_element_type=jnp.float32,
                )
        y = acc + b_ref[0].astype(jnp.float32)
        y = jnp.where(y >= 0, y, negative_slope * y)
        out_ref[...] = y.reshape(1, h, w, cout).astype(out_ref.dtype)

    return kernel


def conv3x3_bias_lrelu_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.01,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused 3x3/s1/SAME conv + bias + LeakyReLU, one image per grid
    step. x: (B, H, W, Cin) NHWC; kernel: (3, 3, Cin, Cout) HWIO."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return pl.pallas_call(
        _make_conv3x3_kernel(h, w, cin, cout, negative_slope),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(xp, kernel, bias.reshape(1, cout))


def conv3x3_bias_lrelu_xla(x, kernel, bias, negative_slope: float = 0.01):
    """The XLA formulation this kernel races against (conv + fused
    epilogue, what ops.blocks.Conv2d emits)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + bias.astype(jnp.float32)
    return jnp.where(y >= 0, y, negative_slope * y).astype(x.dtype)


def _sym_tv_fwd(x):
    return symmetry_tv_losses(x), x


def _sym_tv_bwd(x, g):
    g_sym, g_tv = g

    def scalarised(x):
        s, t = _sym_tv_pair_jnp(x)
        return s * g_sym + t * g_tv

    return (jax.grad(scalarised)(x),)


symmetry_tv_losses.defvjp(_sym_tv_fwd, _sym_tv_bwd)

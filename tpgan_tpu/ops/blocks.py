"""Core building blocks — TPU-native re-design of the reference layer
factory (reference: ModificationLayer.py:5-301).

Semantics preserved from the reference (verified by golden tests against
torch in tests/test_blocks.py):

* ``bias = not use_batchnorm`` (ModificationLayer.py:98,187,221).
* Norm/activation ordering: saturating activations (sigmoid/tanh) come
  *before* BatchNorm, everything else after (ModificationLayer.py:141-151).
* 4-element list padding means reflection padding (left,right,top,bottom)
  with the conv itself unpadded (ModificationLayer.py:83-96).
* ``pre_activation`` moves the norm/act packaging before the conv, sized
  by in_channels (ModificationLayer.py:116-119,195-198).
* ResidualBlock: default out = in // stride, default padding (k-1)//2,
  main path is two stride-1 convs (stride only ever touches the bottleneck
  middle conv), output = act(main(x) + scaling_factor * shortcut(x))
  (ModificationLayer.py:233-301). The reference builds the shortcut from
  the *original* ``use_projection`` argument rather than the recomputed
  one (ModificationLayer.py:281-283) — a latent bug that never fires in
  the models because every call site has in == out and stride == 1; we
  keep the argument-driven behaviour and reject configurations that the
  reference could not run either.

TPU-native design choices:

* NHWC layout, HWIO kernels — XLA's preferred conv layout for the MXU.
* Compute dtype is configurable (bfloat16 by default in production
  configs); the MXU accumulates bf16 convs in float32 internally, and
  parameters stay float32.
* No in-place anything; BatchNorm running stats live in the
  ``batch_stats`` linen collection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from tpgan_tpu.ops import initializers as init_lib
from tpgan_tpu.ops.activations import (
    Activation,
    apply_activation,
    is_saturating,
    negative_slope,
)

Padding = Union[int, Tuple[int, int], Tuple[int, int, int, int]]


def _canon_padding(padding: Padding) -> tuple:
    """Normalise reference-style padding into
    (reflect_lrtb | None, ((top,bottom),(left,right)))."""
    if isinstance(padding, int):
        return None, ((padding, padding), (padding, padding))
    padding = tuple(padding)
    if len(padding) == 2:  # torch (padH, padW)
        ph, pw = padding
        return None, ((ph, ph), (pw, pw))
    if len(padding) == 4:  # reference list => ReflectionPad2d(l,r,t,b)
        return padding, ((0, 0), (0, 0))
    raise ValueError(f"padding must have 1, 2 or 4 elements, got {padding}")


def reflect_pad(x: jnp.ndarray, lrtb: Sequence[int]) -> jnp.ndarray:
    """ReflectionPad2d with torch's (left, right, top, bottom) order on
    NHWC tensors (reference: ModificationLayer.py:91-96)."""
    l, r, t, b = lrtb
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")


class Conv2d(nn.Module):
    """Plain conv with torch-compatible init and padding, NHWC/HWIO.

    Lowered by XLA straight onto the MXU; bias add and any surrounding
    elementwise ops are fused by XLA into the conv epilogue.
    """

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Padding = 0
    use_bias: bool = True
    groups: int = 1  # feature_group_count; groups == in_channels => depthwise
    kernel_init: Any = None  # Initializer; defaults to torch Conv2d default
    bias_init: Any = None
    dtype: Any = jnp.float32
    # Emit float32 from the MXU (preferred_element_type) — measurably
    # faster on v5e for bf16 convs (+30% on the synthesis graph) but
    # incompatible with jax's conv transpose rule under bf16 (mixed-dtype
    # cotangents). True for inference graphs, False wherever the conv is
    # differentiated (training).
    accum_f32: bool = True
    # Zero-pad the input-channel (contraction) dim to this multiple so
    # off-tile concat widths (75/203/206/208 at full size) land on
    # 128-lane MXU tiles. Semantics-preserving: the extra kernel rows
    # only ever see zeros (zero forward contribution, zero gradients);
    # output channels are untouched. Changes the kernel's stored in-dim,
    # so checkpoints are flag-specific. Default off (parity).
    pad_in_multiple: Optional[int] = None

    def _padded_cin(self) -> int:
        cin = self.in_channels
        m = self.pad_in_multiple
        # guard: only pad inputs already wider than half a tile — padding
        # narrow inputs (RGB stems, 64-ch skips) would add real MXU MACs
        # instead of aligning existing ones
        if m and self.groups == 1 and cin % m and cin > m // 2:
            return -(-cin // m) * m
        return cin

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kh, kw = (k, k) if isinstance(k, int) else k
        s = self.stride
        sh, sw = (s, s) if isinstance(s, int) else s
        reflect, pad = _canon_padding(self.padding)

        cin_eff = self._padded_cin()
        kinit = self.kernel_init or init_lib.torch_default_conv()
        kernel = self.param(
            "kernel",
            kinit,
            (kh, kw, cin_eff // self.groups, self.out_channels),
        )
        x = x.astype(self.dtype)
        if cin_eff != self.in_channels:
            x = jnp.pad(
                x, ((0, 0),) * (x.ndim - 1) + ((0, cin_eff - self.in_channels),)
            )
        if reflect is not None:
            x = reflect_pad(x, reflect)

        # trace-time post-training-quantization hooks (ops/quant.py):
        # 'calib' records the input absmax; 'int8' runs the conv as
        # int8 x int8 -> int32 on the MXU with calibrated scales
        from tpgan_tpu.ops import quant as quant_lib

        qmode = quant_lib.current_mode()
        if qmode == quant_lib.CALIB:
            quant_lib.observe(self, x)
        if qmode == quant_lib.INT8 and quant_lib.should_quantize(
            cin_eff // self.groups, self.out_channels
        ):
            y = quant_lib.int8_conv(
                x,
                kernel,
                quant_lib.stored_absmax(self),
                window_strides=(sh, sw),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        else:
            y = lax.conv_general_dilated(
                x,
                kernel.astype(self.dtype),
                window_strides=(sh, sw),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
                **(
                    dict(preferred_element_type=jnp.float32)
                    if self.accum_f32
                    else {}
                ),
            )
        if self.use_bias:
            binit = self.bias_init or init_lib.uniform_bias(
                kh * kw * self.in_channels // self.groups
            )
            bias = self.param("bias", binit, (self.out_channels,))
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


def _subpixel_plan(k: int, s: int, p: int, op: int):
    """Per-dim phase plan for the exact transposed-conv decomposition.

    In the dilated-forward-conv view, the dilated input is non-zero only
    at positions ``padlo + s*i`` (padlo = k-1-p). An output at ``s*m+r``
    therefore touches exactly the kernel taps ``ky ≡ (padlo-r) (mod s)``,
    each reading input ``x[m + (r+ky-padlo)//s]`` — a small stride-1
    conv per phase, zero wasted MACs.

    Returns ``(taps, pad_lo, pad_hi, win, extra)``: ``taps[r]`` lists
    ``(kernel_tap, input_offset)`` for phase r; pad the input by
    ``(pad_lo, pad_hi)``; run a ``win``-wide VALID conv; each phase then
    yields ``H + extra`` outputs (the interleaved total is the torch
    ConvTranspose2d output length, which the caller checked is s*(H+extra)).
    """
    padlo = k - 1 - p
    taps = []
    offs = []
    for r in range(s):
        t = [(ky, (r + ky - padlo) // s) for ky in range((padlo - r) % s, k, s)]
        taps.append(t)
        offs += [d for _, d in t]
    dmin = min(offs) if offs else 0
    dmax = max(offs) if offs else 0
    lo = max(0, -dmin)
    extra = (k + op - 2 * p) // s - 1
    hi = dmax + extra
    win = lo + dmax + 1
    return taps, lo, hi, win, extra


def _subpixel_weights(wf, taps_h, lo_h, win_h, taps_w, lo_w, win_w):
    """Rearrange a flipped deconv kernel (kh, kw, cin, cout) into the
    single stride-1 conv weight (win_h, win_w, cin, sh*sw*cout) of the
    subpixel decomposition (phase-major output blocks, matching the
    depth-to-space reshape). Pure slicing/stack — runs at trace time on
    the traced param, cost negligible next to the conv itself."""
    cin, cout = wf.shape[2], wf.shape[3]
    sh, sw = len(taps_h), len(taps_w)
    lut = {}
    for ry, th in enumerate(taps_h):
        for ky, dy in th:
            for rx, tw in enumerate(taps_w):
                for kx, dx in tw:
                    lut[(dy + lo_h, dx + lo_w, ry * sw + rx)] = (ky, kx)
    zero = jnp.zeros((cin, cout), wf.dtype)
    rows = []
    for wy in range(win_h):
        cols = []
        for wx in range(win_w):
            phases = [
                wf[t[0], t[1]] if (t := lut.get((wy, wx, ph))) is not None
                else zero
                for ph in range(sh * sw)
            ]
            cols.append(jnp.concatenate(phases, axis=-1))
        rows.append(jnp.stack(cols, axis=0))
    return jnp.stack(rows, axis=0)


class ConvTranspose2d(nn.Module):
    """Exact torch ConvTranspose2d(k, s, p, output_padding) semantics.

    Implemented as the mathematically-equivalent forward convolution:
    dilate the input by the stride, pad each side by (k-1-p) with
    ``output_padding`` extra on the high side, and correlate with the
    spatially-flipped kernel. XLA turns this into a single MXU conv —
    no gather/scatter (reference usage: ModificationLayer.py:158-202,
    notably deconv_8's k8-from-1x1 and deconv_32's stride 4 in
    D_and_G_model.py:218-220).

    Kernel is stored (kh, kw, in, out), matching a transposed+flipped view
    of torch's (in, out, kh, kw) for checkpoint import.

    ``algorithm`` selects HOW the same math runs on the MXU:

    * ``"dilated"`` — the textbook forward-conv equivalence above. The
      dilated input is mostly zeros (3/4 at stride 2, 15/16 at stride
      4), and the conv pays MACs for every one of them.
    * ``"subpixel"`` — the exact phase decomposition: output pixels
      with the same (oy mod s, ox mod s) phase touch the same kernel
      taps, so the transposed conv is ONE stride-1 VALID conv with a
      trace-time-rearranged weight of shape (ceil-ish window, cin,
      s^2*out) followed by a depth-to-space reshape. No zero MACs: 2.25x
      fewer MACs for the k3/s2 trunk deconvs and 9-16x fewer for the
      k3/s4 ``deconv_32``. Numerically equal to ``dilated`` up to
      accumulation order (same params, same checkpoints — golden-tested
      vs torch in tests/test_blocks.py). Shapes where the output length
      is not a multiple of the stride (or p > k-1) fall back to
      ``dilated``; every generator deconv qualifies.
    """

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    kernel_init: Any = None
    bias_init: Any = None
    dtype: Any = jnp.float32
    accum_f32: bool = True  # see Conv2d.accum_f32
    pad_in_multiple: Optional[int] = None  # see Conv2d.pad_in_multiple
    algorithm: str = "dilated"  # "dilated" | "subpixel" (see docstring)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kh, kw = (k, k) if isinstance(k, int) else k
        s = self.stride
        sh, sw = (s, s) if isinstance(s, int) else s
        p = self.padding
        ph, pw = (p, p) if isinstance(p, int) else p
        op = self.output_padding
        oph, opw = (op, op) if isinstance(op, int) else op

        cin_eff = self.in_channels
        m = self.pad_in_multiple
        if m and cin_eff % m and cin_eff > m // 2:  # see Conv2d._padded_cin
            cin_eff = -(-cin_eff // m) * m
        kinit = self.kernel_init or init_lib.torch_default_deconv()
        kernel = self.param(
            "kernel", kinit, (kh, kw, cin_eff, self.out_channels)
        )
        x = x.astype(self.dtype)
        if cin_eff != self.in_channels:
            x = jnp.pad(
                x, ((0, 0),) * (x.ndim - 1) + ((0, cin_eff - self.in_channels),)
            )

        from tpgan_tpu.ops import quant as quant_lib

        qmode = quant_lib.current_mode()
        deconv_pad = (
            (kh - 1 - ph, kh - 1 - ph + oph),
            (kw - 1 - pw, kw - 1 - pw + opw),
        )
        if qmode == quant_lib.CALIB:
            # same input either algorithm — one calibration serves both
            quant_lib.observe(self, x)
        subpixel = (
            self.algorithm == "subpixel"
            and (sh > 1 or sw > 1)
            and kh - 1 - ph >= 0 and kw - 1 - pw >= 0
            and (kh + oph - 2 * ph) % sh == 0
            and (kw + opw - 2 * pw) % sw == 0
        )
        if subpixel:
            taps_h, lo_h, hi_h, win_h, _ = _subpixel_plan(kh, sh, ph, oph)
            taps_w, lo_w, hi_w, win_w, _ = _subpixel_plan(kw, sw, pw, opw)
            subpixel = hi_h >= 0 and hi_w >= 0
        wants_int8 = qmode == quant_lib.INT8 and quant_lib.should_quantize(
            cin_eff, self.out_channels
        )
        if subpixel:
            w_sub = _subpixel_weights(
                jnp.flip(kernel, axis=(0, 1)),
                taps_h, lo_h, win_h, taps_w, lo_w, win_w,
            )
            xp = jnp.pad(
                x, ((0, 0), (lo_h, hi_h), (lo_w, hi_w), (0, 0))
            )
            if wants_int8:
                y = quant_lib.int8_conv(
                    xp,
                    w_sub,
                    quant_lib.stored_absmax(self),
                    window_strides=(1, 1),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                y = lax.conv_general_dilated(
                    xp,
                    w_sub.astype(self.dtype),
                    window_strides=(1, 1),
                    padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    **(
                        dict(preferred_element_type=jnp.float32)
                        if self.accum_f32
                        else {}
                    ),
                )
            # depth-to-space: interleave the s^2 phase blocks
            b, mh, mw, _ = y.shape
            y = y.reshape(b, mh, mw, sh, sw, self.out_channels)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, mh * sh, mw * sw, self.out_channels
            )
        elif wants_int8:
            # input dilation just interleaves zeros — exact under int8
            y = quant_lib.int8_conv(
                x,
                jnp.flip(kernel, axis=(0, 1)),
                quant_lib.stored_absmax(self),
                window_strides=(1, 1),
                padding=deconv_pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                lhs_dilation=(sh, sw),
            )
        else:
            y = lax.conv_general_dilated(
                x,
                jnp.flip(kernel, axis=(0, 1)).astype(self.dtype),
                window_strides=(1, 1),
                padding=deconv_pad,
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                **(
                    dict(preferred_element_type=jnp.float32)
                    if self.accum_f32
                    else {}
                ),
            )
        if self.use_bias:
            # torch ConvTranspose2d bias bound uses fan_in = out*kh*kw
            binit = self.bias_init or init_lib.uniform_bias(kh * kw * self.out_channels)
            bias = self.param("bias", binit, (self.out_channels,))
            y = y + bias.astype(y.dtype)
        return y.astype(self.dtype)


class BatchNorm2d(nn.Module):
    """BatchNorm with torch semantics over NHWC (normalise N,H,W).

    * train: batch statistics (biased variance) normalise; running stats
      updated with momentum 0.1 and *unbiased* variance, as torch does.
    * eval: running statistics normalise.
    * ``axis_name``: when set and training, statistics are averaged across
      that mesh axis (cross-replica sync-BN over ICI via psum).

    Running stats live in the ``batch_stats`` collection.
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param("scale", init_lib.ones, (self.num_features,))
        bias = self.param("bias", init_lib.zeros, (self.num_features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.num_features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.num_features,), jnp.float32)
        )

        x32 = x.astype(jnp.float32)
        reduce_axes = tuple(range(x.ndim - 1))  # all but channel
        if train:
            mean = jnp.mean(x32, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(x32), axis=reduce_axes)
            if self.axis_name is not None:
                mean = lax.pmean(mean, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)  # biased, used for normalisation
            n = x32.size // x32.shape[-1]
            if self.axis_name is not None:
                n = n * lax.psum(1, self.axis_name)
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = lax.rsqrt(var + self.eps) * scale.astype(jnp.float32)
        y = (x32 - mean) * inv + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class Sequential(nn.Module):
    """Ordered composition that threads the ``train`` flag — replaces the
    reference's out_channel-propagating ``sequential`` wrapper
    (reference: ModificationLayer.py:5-24); channel arithmetic is explicit
    in our model definitions instead."""

    layers: Tuple[nn.Module, ...]

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x, train=train)
        return x


class ConvBlock(nn.Module):
    """conv + optional BatchNorm + activation, packaged with the
    reference's ordering rules (reference: ModificationLayer.py:54-156)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Padding = 0
    weight_init: Optional[str] = "kaiming"
    activation: Activation = ("relu", 0.0)
    use_batchnorm: bool = False
    pre_activation: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    accum_f32: bool = True
    pad_in_multiple: Optional[int] = None  # see Conv2d.pad_in_multiple

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = Conv2d(
            self.in_channels,
            self.out_channels,
            self.kernel_size,
            self.stride,
            self.padding,
            use_bias=not self.use_batchnorm,
            kernel_init=init_lib.conv_kernel_init(
                self.weight_init, negative_slope(self.activation)
            ),
            dtype=self.dtype,
            accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_in_multiple,
            name="conv",
        )

        def norm_act(h, channels):
            if self.use_batchnorm:
                bn = BatchNorm2d(
                    channels, axis_name=self.bn_axis_name, dtype=self.dtype, name="bn"
                )
                if is_saturating(self.activation):
                    return bn(apply_activation(h, self.activation), train=train)
                return apply_activation(bn(h, train=train), self.activation)
            return apply_activation(h, self.activation)

        if self.pre_activation:
            return conv(norm_act(x, self.in_channels))
        return norm_act(conv(x), self.out_channels)


class DeconvBlock(nn.Module):
    """ConvTranspose2d + optional BatchNorm + activation
    (reference: ModificationLayer.py:158-202).

    ``mode="resize_conv"`` (opt-in, diverges from reference parity)
    replaces the strided transpose conv with nearest-neighbour upsampling
    to the SAME output spatial size followed by a 3x3 stride-1 conv —
    the standard checkerboard-artifact fix (Odena et al., "Deconvolution
    and Checkerboard Artifacts", Distill 2016). Channel/bias/norm/act
    packaging is unchanged, so the two modes are drop-in graph swaps
    (their param trees differ: ``conv`` vs ``deconv``)."""

    in_channels: int
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    output_padding: Union[int, Tuple[int, int]] = 0
    weight_init: Optional[str] = "kaiming"
    activation: Activation = ("relu", 0.0)
    use_batchnorm: bool = False
    pre_activation: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    accum_f32: bool = True
    pad_in_multiple: Optional[int] = None  # see Conv2d.pad_in_multiple
    mode: str = "deconv"  # "deconv" (reference parity) | "subpixel"
    # (same math/params as deconv, phase-decomposed — no dilation-zero
    # MACs) | "resize_conv" (different params; the quality winner)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.mode == "resize_conv":
            k = self.kernel_size
            kh, kw_ = (k, k) if isinstance(k, int) else k
            s = self.stride
            sh, sw = (s, s) if isinstance(s, int) else s
            p = self.padding
            ph, pw = (p, p) if isinstance(p, int) else p
            op = self.output_padding
            oph, opw = (op, op) if isinstance(op, int) else op
            conv = Conv2d(
                self.in_channels,
                self.out_channels,
                3, 1, 1,
                use_bias=not self.use_batchnorm,
                kernel_init=init_lib.conv_kernel_init(
                    self.weight_init, negative_slope(self.activation)
                ),
                dtype=self.dtype,
                accum_f32=self.accum_f32,
                pad_in_multiple=self.pad_in_multiple,
                name="conv",
            )

            def deconv(h):
                # target size = the torch ConvTranspose2d output formula,
                # so the two modes are shape-identical at every call site
                hh, ww = h.shape[1], h.shape[2]
                out_h = (hh - 1) * sh - 2 * ph + kh + oph
                out_w = (ww - 1) * sw - 2 * pw + kw_ + opw
                if out_h % hh == 0 and out_w % ww == 0:
                    h = jnp.repeat(h, out_h // hh, axis=1)
                    h = jnp.repeat(h, out_w // ww, axis=2)
                else:
                    h = jax.image.resize(
                        h, (h.shape[0], out_h, out_w, h.shape[3]), "nearest"
                    )
                return conv(h)

        elif self.mode in ("deconv", "subpixel"):
            # "subpixel" = the same ConvTranspose2d (identical params —
            # checkpoints interchange) computed via the exact phase
            # decomposition instead of input dilation; see
            # ConvTranspose2d.algorithm
            deconv = ConvTranspose2d(
                self.in_channels,
                self.out_channels,
                self.kernel_size,
                self.stride,
                self.padding,
                self.output_padding,
                use_bias=not self.use_batchnorm,
                kernel_init=init_lib.deconv_kernel_init(
                    self.weight_init, negative_slope(self.activation)
                ),
                dtype=self.dtype,
                accum_f32=self.accum_f32,
                pad_in_multiple=self.pad_in_multiple,
                algorithm="subpixel" if self.mode == "subpixel" else "dilated",
                name="deconv",
            )
        else:
            raise ValueError(f"unknown DeconvBlock mode {self.mode!r}")

        def norm_act(h, channels):
            if self.use_batchnorm:
                bn = BatchNorm2d(
                    channels, axis_name=self.bn_axis_name, dtype=self.dtype, name="bn"
                )
                if is_saturating(self.activation):
                    return bn(apply_activation(h, self.activation), train=train)
                return apply_activation(bn(h, train=train), self.activation)
            return apply_activation(h, self.activation)

        if self.pre_activation:
            return deconv(norm_act(x, self.in_channels))
        return norm_act(deconv(x), self.out_channels)


class LinearBlock(nn.Module):
    """Linear + optional BatchNorm1d + activation
    (reference: ModificationLayer.py:204-231). Kernel stored (in,out)."""

    in_features: int
    out_features: int
    activation: Activation = None
    use_batchnorm: bool = False
    kernel_init: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kinit = self.kernel_init or init_lib.torch_default_linear()
        kernel = self.param("kernel", kinit, (self.in_features, self.out_features))
        x = x.astype(self.dtype)
        y = jnp.dot(x, kernel.astype(self.dtype))
        if not self.use_batchnorm:
            bias = self.param(
                "bias", init_lib.uniform_bias(self.in_features), (self.out_features,)
            )
            y = y + bias.astype(y.dtype)
        y = y.astype(self.dtype)
        if self.use_batchnorm:
            y = BatchNorm2d(self.out_features, dtype=self.dtype, name="bn")(
                y, train=train
            )
        return apply_activation(y, self.activation)


class ResidualBlock(nn.Module):
    """Two-conv (or three-conv bottleneck) residual block
    (reference: ModificationLayer.py:233-301).

    out = act( main(x) + scaling_factor * shortcut(x) )

    The shortcut is a 1x1 projection conv only when ``use_projection`` is
    passed (matching the reference's argument-driven construction); every
    model call site keeps in == out, stride == 1 where identity is valid.
    """

    in_channels: int
    out_channels: Optional[int] = None
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[Padding] = None
    weight_init: Optional[str] = "kaiming"
    activation: Activation = ("relu", 0.0)
    is_bottleneck: bool = False
    use_projection: bool = False
    scaling_factor: float = 1.0
    use_batchnorm: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    accum_f32: bool = True
    pad_in_multiple: Optional[int] = None  # see Conv2d.pad_in_multiple

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_ch = (
            self.in_channels // self.stride
            if self.out_channels is None
            else self.out_channels
        )
        pad = (
            (self.kernel_size - 1) // 2 if self.padding is None else self.padding
        )
        if not self.use_projection and (
            out_ch != self.in_channels or self.stride != 1
        ):
            raise ValueError(
                "identity shortcut needs in==out and stride==1 "
                f"(got in={self.in_channels}, out={out_ch}, stride={self.stride}); "
                "pass use_projection=True — the reference would fail at "
                "runtime here too (ModificationLayer.py:281-283)"
            )

        common = dict(
            use_batchnorm=self.use_batchnorm,
            bn_axis_name=self.bn_axis_name,
            dtype=self.dtype,
            accum_f32=self.accum_f32,
            pad_in_multiple=self.pad_in_multiple,
        )
        if self.is_bottleneck:
            h = ConvBlock(
                self.in_channels, self.in_channels // 2, 1, 1, 0,
                self.weight_init, self.activation, name="conv0", **common,
            )(x, train=train)
            h = ConvBlock(
                self.in_channels // 2, out_ch // 2, self.kernel_size, self.stride,
                (self.kernel_size - 1) // 2,
                self.weight_init, self.activation, name="conv1", **common,
            )(h, train=train)
            h = ConvBlock(
                out_ch // 2, out_ch, 1, 1, 0, None, None, name="conv2", **common,
            )(h, train=train)
        else:
            h = ConvBlock(
                self.in_channels, self.in_channels, self.kernel_size, 1, pad,
                self.weight_init, self.activation, name="conv0", **common,
            )(x, train=train)
            h = ConvBlock(
                self.in_channels, out_ch, self.kernel_size, 1, pad,
                None, None, name="conv1", **common,
            )(h, train=train)

        if self.use_projection:
            sc = ConvBlock(
                self.in_channels, out_ch, 1, self.stride, 0,
                self.weight_init, None, use_batchnorm=False, dtype=self.dtype,
                accum_f32=self.accum_f32, name="shortcut",
            )(x, train=train)
        else:
            sc = x
        out = h + jnp.asarray(self.scaling_factor, h.dtype) * sc
        return apply_activation(out, self.activation)

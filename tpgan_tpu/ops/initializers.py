"""Weight initializers with exact PyTorch semantics.

The reference initialises conv/deconv weights with (deprecated-alias)
``kaiming_normal`` / ``xavier_normal`` (reference: ModificationLayer.py:26-52)
and leaves layers built with ``init=None`` on torch's *default* Conv2d /
Linear init (kaiming-uniform with a=sqrt(5)). For checkpoint- and
distribution-parity we reproduce all of these, including torch's fan
computation quirks:

* Conv2d weight (out,in,kh,kw): fan_in = in*kh*kw.
* ConvTranspose2d weight (in,out,kh,kw): torch computes fan_in from
  ``weight.size(1)`` => fan_in = out*kh*kw (yes, the *output* channels).
* Linear weight (out,in): fan_in = in.
* Bias: U(-1/sqrt(fan_in), +1/sqrt(fan_in)) with the same fan_in.

Our array layouts are TPU-native: conv kernels HWIO (kh,kw,in,out),
deconv kernels (kh,kw,in,out) pre-flip, linear kernels (in,out).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp

Initializer = Callable[[jax.Array, Sequence[int], jnp.dtype], jnp.ndarray]


def _leaky_gain(a: float) -> float:
    return math.sqrt(2.0 / (1.0 + a * a))


def _fans_conv_hwio(shape: Sequence[int]) -> tuple[int, int]:
    kh, kw, cin, cout = shape
    return kh * kw * cin, kh * kw * cout


def kaiming_normal_conv(a: float = 0.0) -> Initializer:
    """He-normal, fan_in mode, leaky slope ``a`` — for HWIO conv kernels."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans_conv_hwio(shape)
        std = _leaky_gain(a) / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def kaiming_normal_deconv(a: float = 0.0) -> Initializer:
    """He-normal for deconv kernels stored (kh,kw,in,out).

    torch's fan_in for ConvTranspose2d weights is out*kh*kw because it
    always reads dim 1 of the (in,out,kh,kw) tensor."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _cin, cout = shape
        fan_in = cout * kh * kw
        std = _leaky_gain(a) / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_conv() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _fans_conv_hwio(shape)
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_deconv() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        kh, kw, cin, cout = shape
        fan_in, fan_out = cout * kh * kw, cin * kh * kw
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_default_conv() -> Initializer:
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) => U(+-1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fans_conv_hwio(shape)
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_default_deconv() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        kh, kw, _cin, cout = shape
        bound = 1.0 / math.sqrt(cout * kh * kw)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def uniform_bias(fan_in: int) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_linear(a: float = 0.0) -> Initializer:
    """He-normal for (in,out) linear kernels, fan_in = in."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        std = _leaky_gain(a) / math.sqrt(fan_in)
        return std * jax.random.normal(key, shape, dtype)

    return init


def xavier_normal_linear() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1]
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape, dtype)

    return init


def torch_default_linear() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal(std: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def he_ssd_conv() -> Initializer:
    """MobileNetV2's explicit He re-init: N(0, sqrt(2/(kh*kw*out)))
    (reference: MobileNetV2.py:225-233)."""

    def init(key, shape, dtype=jnp.float32):
        kh, kw, _cin, cout = shape
        std = math.sqrt(2.0 / (kh * kw * cout))
        return std * jax.random.normal(key, shape, dtype)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(key, shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def conv_kernel_init(init_name, activation_slope: float) -> Initializer:
    """Dispatch matching the reference's ``weight_initialization``
    (reference: ModificationLayer.py:26-52): 'kaiming' uses the activation's
    negative slope; None falls back to torch's default layer init."""
    if init_name is None:
        return torch_default_conv()
    if init_name == "kaiming":
        return kaiming_normal_conv(activation_slope)
    if init_name == "xavier":
        return xavier_normal_conv()
    raise ValueError(f"unknown init {init_name!r}")


def deconv_kernel_init(init_name, activation_slope: float) -> Initializer:
    if init_name is None:
        return torch_default_deconv()
    if init_name == "kaiming":
        return kaiming_normal_deconv(activation_slope)
    if init_name == "xavier":
        return xavier_normal_deconv()
    raise ValueError(f"unknown init {init_name!r}")

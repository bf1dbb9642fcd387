"""Shared NN building blocks (Flax, NHWC).

Semantics matched to the reference's torch layers so released checkpoints
convert exactly:

* torch ``nn.BatchNorm2d``: eps=1e-5, momentum=0.1 (tf_ EfficientNet
  variants: eps=1e-3). Flax momentum convention is the complement.
* torch ``nn.LeakyReLU()`` default slope 0.01 (D_dense_depth.py:34).
* weight-standardized conv (D_dense_depth.py:63-77): per-output-channel
  mean subtraction, then division by the *unbiased* std over each filter
  + 1e-5.

Under jit with a batch axis sharded across the mesh, BatchNorm's batch
statistics are global means — cross-replica SyncBN (train_DNet.py:201)
falls out of SPMD with no extra code.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

leaky_relu = jax.nn.leaky_relu       # default negative_slope 0.01
swish = jax.nn.silu
relu = jax.nn.relu


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


import os

# Depthwise convs can run as explicit shift-multiply-accumulate on the VPU
# instead of XLA's convolution path; XLA relayouts tensors around grouped
# convolutions (~10 ms/frame of 'data formatting' in the EfficientNet
# trunk). Opt-in via env because the better choice is hardware-dependent.
_DW_SHIFT_ADD = os.environ.get("MAGNET_TPU_DW_SHIFT_ADD", "0") == "1"


def _same_pads(size: int, k: int, s: int) -> Tuple[int, int]:
    """TF-SAME padding (right/bottom heavy)."""
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return total // 2, total - total // 2


def _depthwise_shift_add(x, kernel, stride, padding):
    """Depthwise conv as sum of shifted elementwise products.
    x: (B, H, W, C); kernel: (kh, kw, 1, C)."""
    kh, kw, _, C = kernel.shape
    B, H, W, _ = x.shape
    if padding == "SAME":
        py = _same_pads(H, kh, stride[0])
        px = _same_pads(W, kw, stride[1])
    else:
        py, px = padding
    xp = jnp.pad(x, ((0, 0), py, px, (0, 0)))
    Hp, Wp = xp.shape[1], xp.shape[2]
    oh = (Hp - kh) // stride[0] + 1
    ow = (Wp - kw) // stride[1] + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = xp[:, dy:dy + (oh - 1) * stride[0] + 1:stride[0],
                    dx:dx + (ow - 1) * stride[1] + 1:stride[1], :]
            term = sl * kernel[dy, dx, 0][None, None, None, :]
            acc = term if acc is None else acc + term
    return acc


class _DWShiftAddConv(nn.Module):
    """Parameter-compatible stand-in for a depthwise nn.Conv ('kernel' /
    'bias' under the same scope) computing via shift-add."""
    features: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int]
    padding: Any
    use_bias: bool
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, 1, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        y = _depthwise_shift_add(x.astype(dt), kernel.astype(dt),
                                 self.stride, self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


class Conv(nn.Module):
    """2-D conv, NHWC, torch-style explicit symmetric padding by default.

    padding: int -> ((p, p), (p, p)); "SAME" -> TF-SAME (asymmetric,
    right/bottom heavy) used by the tf_ EfficientNet variants.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, str, Sequence[Tuple[int, int]]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        is_depthwise = (self.groups > 1 and self.groups == x.shape[-1]
                        and self.features == self.groups
                        and _pair(self.dilation) == (1, 1))
        if _DW_SHIFT_ADD and is_depthwise:
            return _DWShiftAddConv(
                features=self.features, kernel_size=_pair(self.kernel_size),
                stride=_pair(self.stride), padding=pad,
                use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        return nn.Conv(
            features=self.features,
            kernel_size=_pair(self.kernel_size),
            strides=_pair(self.stride),
            padding=pad,
            kernel_dilation=_pair(self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv")(x)


class WSConv(nn.Module):
    """Weight-standardized conv (reference Conv2d, D_dense_depth.py:63-77).

    The kernel is standardized at every call: subtract the per-output-channel
    mean, divide by the per-filter unbiased std + 1e-5.
    """
    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: int = 0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)

        mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
        k = kernel - mean
        # torch .std() is unbiased (N-1 denominator) over each filter.
        n = kh * kw * in_ch
        var = jnp.sum(k * k, axis=(0, 1, 2), keepdims=True) / max(n - 1, 1)
        k = k / (jnp.sqrt(var) + 1e-5)

        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt),
            window_strides=_pair(self.stride),
            padding=((self.padding, self.padding),
                     (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(dt)


class BatchNorm(nn.Module):
    """BatchNorm matching torch semantics (momentum 0.1 -> flax 0.9)."""
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=jnp.float32,       # stats + affine in f32
            name="bn")(x.astype(jnp.float32))
        return y.astype(dt)


class GroupNorm(nn.Module):
    num_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         dtype=jnp.float32, name="gn")(
                             x.astype(jnp.float32))
        return y.astype(dt)


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x * mask / keep

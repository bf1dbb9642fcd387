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
# trunk). Measured on v5e end-to-end (2026-08-17): ALL dw convs
# shift-add (=1) LOSES (19.1 vs 26.2 fps — the VPU tap loop loses on
# the wide-channel late stages), but applying it selectively to the
# narrow early stages WINS big: threshold 48 (= exactly EfficientNet
# stage 1 at 240x320, whose XLA grouped convs are layout-copy bound)
# gives 26.2 -> 28.4 fps; threshold 144 (adding stage 2's expanded dw)
# regresses to 25.3. Default MAXC=48; both env-overridable.
_DW_SHIFT_ADD = os.environ.get("MAGNET_TPU_DW_SHIFT_ADD", "0") == "1"
_DW_SHIFT_ADD_MAXC = int(
    os.environ.get("MAGNET_TPU_DW_SHIFT_ADD_MAXC", "48"))


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


def space_to_depth_conv2(x, kernel, pads, dt):
    """Stride-2 conv on a tiny-channel input (e.g. the RGB stem), computed
    as space-to-depth + stride-1 conv — mathematically identical.

    Why: XLA pads the lane (channel) dimension to a full 128 tile; a
    3-channel 480x640 input inflates 42x in 'data formatting' copies
    (~2 ms/frame on the PSM-Net stem alone). After 2x2 space-to-depth the
    channel dim is 4C and the spatial grid quarter-size — the same conv at
    a tenth of the relayout traffic.

    x: (B, H, W, C), H and W even; kernel: (kh, kw, C, O);
    pads: ((pt, pb), (pl, pr)) element-space padding for stride 2.
    Returns (B, ceil(H/2), ceil(W/2), O) — equal to
    lax.conv_general_dilated(x, kernel, (2, 2), pads, NHWC).
    """
    B, H, W, C = x.shape
    kh, kw, _, O = kernel.shape
    (pt, pb), (pl_, pr) = pads
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

    # Tap (dy, dx) of the stride-2 conv reads block (by, bx) offset
    # ((dy-pt)>>1, (dx-pl)>>1) at parity ((dy-pt)&1, (dx-pl)&1).
    offy = [(dy - pt) >> 1 for dy in range(kh)]
    offx = [(dx - pl_) >> 1 for dx in range(kw)]
    k2h = max(offy) - min(offy) + 1
    k2w = max(offx) - min(offx) + 1
    k2 = jnp.zeros((k2h, k2w, 2, 2, C, O), kernel.dtype)
    for dy in range(kh):
        for dx in range(kw):
            k2 = k2.at[offy[dy] - min(offy), offx[dx] - min(offx),
                       (dy - pt) & 1, (dx - pl_) & 1].set(kernel[dy, dx])
    k2 = k2.reshape(k2h, k2w, 4 * C, O)
    pads2 = ((-min(offy), max(offy)), (-min(offx), max(offx)))
    return jax.lax.conv_general_dilated(
        xs.astype(dt), k2.astype(dt), (1, 1), pads2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2d_applicable(x_shape, kh: int, kw: int, stride) -> bool:
    """Opt-in (MAGNET_TPU_S2D=1). MEASURED NEUTRAL on v5e for the RGB
    stems: the stride-2 conv's 'data formatting' cost (~2 ms/5-frame pass,
    42x lane-padding of a 3-channel tensor) just moves into the
    space-to-depth transpose of the same padded tensor. Kept because the
    transform is exact and the balance may differ on other topologies."""
    if os.environ.get("MAGNET_TPU_S2D", "") != "1":
        return False
    N, H, W, C = x_shape
    return (tuple(stride) == (2, 2) and C <= 8 and H % 2 == 0
            and W % 2 == 0 and kh <= 4 and kw <= 4)


def _pw_dot_maxc() -> int:
    """MAGNET_TPU_PW_DOT: run narrow 1x1 stride-1 convs (both channel
    ends <= this threshold) as an einsum/dot instead of an XLA
    convolution. Motivation (docs/KERNELS.md round-4 copies table): the
    EfficientNet stage-0 ds blocks run their depthwise convs as
    shift-add in NATURAL layout, but the surrounding XLA 1x1 convs pick
    batch-interleaved blocked layouts, costing ~1.0 ms/frame of
    blocked<->natural transition copies; a dot contraction keeps the
    natural layout end to end. 0 disables (default pending A/B)."""
    return int(os.environ.get("MAGNET_TPU_PW_DOT", "0"))


class _PWDotConv(nn.Module):
    """Parameter-compatible stand-in for a 1x1 stride-1 nn.Conv
    ('kernel'/'bias' under scope 'conv') computing via jnp.einsum —
    lowers to a dot_general in the activations' natural layout."""
    features: int
    use_bias: bool
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features),
                            jnp.float32)
        dt = self.dtype or x.dtype
        y = jnp.einsum("nhwc,cm->nhwm", x.astype(dt),
                       kernel[0, 0].astype(dt))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(dt)
        return y


def _use_pallas_dw() -> bool:
    """Opt-in (MAGNET_TPU_PALLAS_DW=1) Pallas depthwise conv
    (kernels/dwconv_pallas.py). MEASURED SLOWER than XLA's grouped conv on
    v5e at the EfficientNet-B5 trunk shapes (24.1 vs 13.3 ms per 5-frame
    pass: per-program overhead across 35 convs x ~60-program grids plus
    losing XLA's BN/swish epilogue fusion outweigh the avoided relayouts).
    Kept as a documented experiment; default off everywhere. On non-TPU
    backends a forced '1' runs in interpret mode (integration tests)."""
    return os.environ.get("MAGNET_TPU_PALLAS_DW", "") == "1"


class _DWPallasConv(nn.Module):
    """Depthwise conv via the Pallas kernel; parameter-compatible with the
    nn.Conv it replaces ('kernel' under scope 'conv')."""
    features: int
    kernel_size: Tuple[int, int]
    padding: Any
    dtype: Optional[Dtype]

    @nn.compact
    def __call__(self, x):
        from magnet_tpu.kernels.dwconv_pallas import dw_conv_pallas
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, 1, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        return dw_conv_pallas(x.astype(dt), kernel.astype(dt), self.padding,
                              interpret=jax.default_backend() != "tpu")


class _S2DConv(nn.Module):
    """Stride-2 small-channel conv via space_to_depth_conv2; parameter-
    compatible with the nn.Conv it replaces ('kernel'/'bias' under scope
    'conv')."""
    features: int
    kernel_size: Tuple[int, int]
    padding: Any
    use_bias: bool
    dtype: Optional[Dtype]
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        dt = self.dtype or x.dtype
        y = space_to_depth_conv2(x, kernel, self.padding, dt)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


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
    def __call__(self, x, dw_pallas: bool = False):
        """dw_pallas: allow the Pallas depthwise kernel for this call —
        pass ``not train`` at call sites (the kernel has no custom VJP;
        training keeps XLA's differentiable grouped conv)."""
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        is_depthwise = (self.groups > 1 and self.groups == x.shape[-1]
                        and self.features == self.groups
                        and _pair(self.dilation) == (1, 1))
        if is_depthwise and dw_pallas and not self.use_bias \
                and _use_pallas_dw():
            from magnet_tpu.kernels import dwconv_pallas as dwp
            kh, kw = _pair(self.kernel_size)
            epad = pad
            if epad == "SAME":
                epad = (_same_pads(x.shape[1], kh, _pair(self.stride)[0]),
                        _same_pads(x.shape[2], kw, _pair(self.stride)[1]))
            if dwp.supported(x.shape, kh, kw, _pair(self.stride), epad):
                return _DWPallasConv(
                    features=self.features, kernel_size=(kh, kw),
                    padding=epad, dtype=self.dtype, name="conv")(x)
        if (self.groups == 1 and _pair(self.dilation) == (1, 1)
                and _s2d_applicable(x.shape, *_pair(self.kernel_size),
                                    _pair(self.stride))):
            kh, kw = _pair(self.kernel_size)
            epad = pad
            if epad == "SAME":
                epad = (_same_pads(x.shape[1], kh, 2),
                        _same_pads(x.shape[2], kw, 2))
            return _S2DConv(features=self.features, kernel_size=(kh, kw),
                            padding=epad, use_bias=self.use_bias,
                            dtype=self.dtype, name="conv")(x)
        if (self.groups == 1 and _pair(self.kernel_size) == (1, 1)
                and _pair(self.stride) == (1, 1)
                and pad in ("SAME", ((0, 0), (0, 0)))
                and 0 < _pw_dot_maxc()
                and max(x.shape[-1], self.features) <= _pw_dot_maxc()):
            return _PWDotConv(features=self.features,
                              use_bias=self.use_bias, dtype=self.dtype,
                              name="conv")(x)
        if is_depthwise and (_DW_SHIFT_ADD
                             or (x.shape[-1] <= _DW_SHIFT_ADD_MAXC
                                 and _pair(self.stride) == (1, 1))):
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
    """BatchNorm matching torch semantics (momentum 0.1 -> flax 0.9).

    Train mode: full f32 statistics/normalization (batch stats must not
    round). Eval mode: the normalization is a constant per-channel affine —
    fold (gamma, beta, mean, var) into (scale, shift) in f32 and apply in
    the activation dtype, so bf16 activations never round-trip through an
    f32 tensor between convs (the f32 copies showed up as 'data formatting'
    time around every conv on TPU). The output is bf16 either way; the only
    difference is one bf16 rounding of the intermediate product.
    """
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = x.dtype
        bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            dtype=jnp.float32,       # stats + affine in f32
            name="bn")
        if train or self.is_initializing():
            return bn(x.astype(jnp.float32)).astype(dt)
        v = self.variables
        p = v["params"]["bn"]
        stats = v["batch_stats"]["bn"]
        scale = p["scale"] * jax.lax.rsqrt(stats["var"] + self.eps)
        shift = p["bias"] - stats["mean"] * scale
        return x * scale.astype(dt) + shift.astype(dt)


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

"""Bilinear resampling primitives (NHWC, XLA-fused).

Three ops with exact reference semantics:

* ``grid_sample``: bilinear sampling at arbitrary normalized coordinates with
  half-pixel centers and zero padding outside — the semantics of torch
  ``F.grid_sample(mode='bilinear', padding_mode='zeros',
  align_corners=False)`` used by the plane-sweep warp
  (reference models/submodules/homography.py:70,150-152).

* ``resize_bilinear_align_corners``: separable bilinear resize with
  ``align_corners=True`` (torch ``F.interpolate``), used by the decoder's
  skip-upsampling (D_dense_depth.py:40,57) and PSM-Net's SPP branches
  (F_psmnet.py:111-120). Implemented as two small dense matmuls (one per
  axis) — on TPU this maps onto the MXU instead of a gather.

* ``avg_pool``: torch ``nn.AvgPool2d`` with ``ceil_mode=False`` (F_psmnet.py
  SPP pooling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_gather(feat: jnp.ndarray, x: jnp.ndarray,
                    y: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (H, W, C) at continuous pixel coordinates
    (x, y) — index space, (0, 0) = center of the top-left pixel —
    with bilinear interpolation and zeros outside the image.

    x, y: any broadcast-matching shape P...; returns (P..., C).
    """
    H, W, C = feat.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(yi, xi, w):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        # Clamp for a safe gather; out-of-bounds corners get zero weight.
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        idx = yc * W + xc
        vals = jnp.take(feat.reshape(H * W, C), idx.reshape(-1), axis=0)
        vals = vals.reshape(idx.shape + (C,))
        return vals * (w * inb.astype(jnp.float32))[..., None]

    out = (corner(y0i, x0i, wy0 * wx0) + corner(y0i, x1i, wy0 * wx1)
           + corner(y1i, x0i, wy1 * wx0) + corner(y1i, x1i, wy1 * wx1))
    return out


def gather_corner_block(feat: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """ONE lax.gather of the (2, 2, C) corner block per sample plus the
    bilinear corner weights (the TPU-friendly decomposition of
    grid_sample: per-slice overhead dominates TPU gather cost, so four
    single-row gathers become one block gather).

    Returns (block (P..., 2, 2, C) in feat.dtype, w (P..., 2, 2) f32).
    Weights are max(0, 1 - |coord - corner|), which reproduces
    zeros-padding exactly (including the half-open boundary) without
    explicit bounds tests; the block origin is clamped in-bounds and any
    corner not part of the true neighborhood gets weight 0.
    """
    H, W, C = feat.shape
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    shape = x.shape

    xf = x.reshape(-1)
    yf = y.reshape(-1)
    y0 = jnp.clip(jnp.floor(yf), 0, max(H - 2, 0)).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xf), 0, max(W - 2, 0)).astype(jnp.int32)

    starts = jnp.stack([y0, x0], axis=-1)                   # (P, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    block = jax.lax.gather(
        feat, starts, dnums, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)   # (P, 2, 2, C)

    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        yf[:, None] - (y0[:, None] + jnp.arange(2, dtype=jnp.float32))))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        xf[:, None] - (x0[:, None] + jnp.arange(2, dtype=jnp.float32))))
    w = wy[:, :, None] * wx[:, None, :]                     # (P, 2, 2)
    return (block.reshape(shape + (2, 2, C)),
            w.reshape(shape + (2, 2)).astype(jnp.float32))


def bilinear_gather_block(feat: jnp.ndarray, x: jnp.ndarray,
                          y: jnp.ndarray) -> jnp.ndarray:
    """grid_sample-equivalent bilinear sampling via `gather_corner_block`."""
    block, w = gather_corner_block(feat, x, y)
    out = jnp.einsum("...yx,...yxc->...c", w, block.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return out


def grid_sample(feat: jnp.ndarray, gx: jnp.ndarray,
                gy: jnp.ndarray) -> jnp.ndarray:
    """torch-compatible grid_sample on one image.

    feat: (H, W, C); gx, gy: normalized coords in [-1, 1] (any shape P...).
    align_corners=False: gx=-1 maps to x=-0.5 (left edge), gx=+1 to W-0.5.
    Returns (P..., C).
    """
    H, W, _ = feat.shape
    x = ((gx + 1.0) * W - 1.0) * 0.5
    y = ((gy + 1.0) * H - 1.0) * 0.5
    return bilinear_gather(feat, x, y)


@functools.lru_cache(maxsize=64)
def _resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with align_corners=True."""
    if n_in == 1:
        return np.ones((n_out, 1), dtype=np.float32)
    if n_out == 1:
        # align_corners=True with a single output sample reads index 0.
        m = np.zeros((1, n_in), dtype=np.float32)
        m[0, 0] = 1.0
        return m
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.floor(pos).astype(np.int64)
    i0 = np.minimum(i0, n_in - 2)
    w1 = pos - i0
    m = np.zeros((n_out, n_in), dtype=np.float64)
    m[np.arange(n_out), i0] = 1.0 - w1
    m[np.arange(n_out), i0 + 1] = w1
    return m.astype(np.float32)


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                  out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True. x: (..., H, W, C)."""
    *lead, H, W, C = x.shape
    if H == out_h and W == out_w:
        return x
    my = jnp.asarray(_resize_matrix(H, out_h))          # (out_h, H)
    mx = jnp.asarray(_resize_matrix(W, out_w))          # (out_w, W)
    dt = x.dtype
    xf = x.astype(jnp.float32)
    # (..., H, W, C) -> (..., out_h, W, C)
    y = jnp.einsum("oh,...hwc->...owc", my, xf)
    # -> (..., out_h, out_w, C)
    y = jnp.einsum("pw,...owc->...opc", mx, y)
    return y.astype(dt)


def resize_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest resize matching torch F.interpolate(mode='nearest')."""
    *lead, H, W, C = x.shape
    iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
    ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
    return x[..., iy, :, :][..., :, ix, :]


def avg_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """AvgPool2d(window, stride), VALID, floor sizing. x: (..., H, W, C)."""
    ndim = x.ndim
    dims = [1] * ndim
    strides = [1] * ndim
    dims[-3] = dims[-2] = window
    strides[-3] = strides[-2] = stride
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        window_dimensions=dims, window_strides=strides, padding="VALID")
    return (summed / float(window * window)).astype(x.dtype)

"""Pallas TPU kernel: stride-1 depthwise convolution, plain NHWC.

Why: XLA lowers ``feature_group_count=C`` convolutions on TPU through a
blocked channel layout — every depthwise conv in the EfficientNet-B5 trunk
(35 of 39 blocks are stride 1) is bracketed by 'data formatting' copies,
~8.7 ms of a 43 ms MaGNet frame, and the conv itself runs on the MXU where
a per-channel filter has nothing to contract. A depthwise conv is VPU work:
out[i, j, c] = sum_{dy, dx} x[i+dy, j+dx, c] * w[dy, dx, c] — a handful of
shifted elementwise multiply-accumulates per tap, bandwidth-bound.

Design:
  * The input is zero-padded in XLA beforehand (TF-SAME amounts plus enough
    bottom rows to complete a whole extra row tile) — one cheap fused pad
    pass buys a kernel with no edge masks at all.
  * Grid (N, row_tiles). The halo problem (row tile t needs kh-1 rows of
    tile t+1) is solved with TWO BlockSpecs onto the SAME padded array: one
    mapped to tile t, one to tile t+1. Pallas pipelines both like any other
    input — double-buffered DMA with zero hand-written copies.
  * Per program: band = concat(tile_t, tile_{t+1}[:kh-1]); for each tap,
    a static (row, col)-shifted slice of the band is multiply-accumulated
    in f32 on the VPU; the tap loop is fully unrolled (kh*kw <= 25).

Reference being replaced: the cuDNN depthwise convs inside torch's
EfficientNet blocks (D_dense_depth.py:10-11 via torch.hub).
Training keeps the XLA grouped-conv path (this kernel is used on the
no-gradient inference path; see layers.Conv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def choose_tile_h(H: int, W: int, C: int, kw: int, itemsize: int = 2):
    """Smallest-overhead row tile: must divide H; VMEM footprint is ~6 live
    blocks of (tile_h, W+kw-1, C padded to a lane tile) with pipeline
    double-buffering — keep it well under the 16 MB budget. Returns None
    when no candidate fits (falls back to XLA)."""
    c_pad = _round_up(C, 128)
    for t in (8, 12, 16, 10, 6, 15, 5, 20, 4, 3, 2, H):
        if H % t:
            continue
        vmem = 6 * t * _round_up(W + kw - 1, 8) * c_pad * itemsize
        if vmem <= 12 * 1024 * 1024:
            return t
    return None


def _kernel(x1_ref, x2_ref, w_ref, out_ref, *, kh: int, kw: int, w_out: int,
            tile_h: int):
    band = jnp.concatenate([x1_ref[0], x2_ref[0][: kh - 1]], axis=0)
    w = w_ref[...].astype(jnp.float32)                 # (kh, kw, C)
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            sl = band[dy:dy + tile_h, dx:dx + w_out, :].astype(jnp.float32)
            term = sl * w[dy, dx][None, None, :]
            acc = term if acc is None else acc + term
    out_ref[0] = acc.astype(out_ref.dtype)


def supported(x_shape, kh: int, kw: int, stride, padding) -> bool:
    """Stride-1 SAME-style (symmetric-or-TF) paddings only; output must
    tile whole rows."""
    if tuple(stride) != (1, 1):
        return False
    (pt, pb), (pl_, pr) = padding
    if pt + pb != kh - 1 or pl_ + pr != kw - 1:
        return False                 # only shape-preserving convs
    N, H, W, C = x_shape
    tile_h = choose_tile_h(H, W, C, kw)
    return (tile_h is not None and kh <= tile_h + 1 and kh * kw <= 32)


def dw_conv_pallas(x: jnp.ndarray, w: jnp.ndarray, padding,
                   interpret: bool = False) -> jnp.ndarray:
    """x: (N, H, W, C); w: (kh, kw, 1, C) HWIO depthwise kernel;
    padding: ((pt, pb), (pl, pr)) with pt+pb = kh-1, pl+pr = kw-1.
    Returns (N, H, W, C), same dtype as x. Stride 1 only."""
    N, H, W, C = x.shape
    kh, kw = w.shape[0], w.shape[1]
    (pt, pb), (pl_, pr) = padding
    tile_h = choose_tile_h(H, W, C, kw, x.dtype.itemsize)
    T = H // tile_h

    # Pad: TF-SAME amounts + bottom fill so the padded height is exactly
    # (T+1) row tiles — the halo BlockSpec (tile t+1) is then always a
    # real block and the kernel needs no masks.
    pb_fill = (T + 1) * tile_h - H - pt
    xp = jnp.pad(x, ((0, 0), (pt, pb_fill), (pl_, pr), (0, 0)))
    wp = W + kw - 1

    row_spec = pl.BlockSpec((1, tile_h, wp, C),
                            lambda n, t: (n, t, 0, 0))
    halo_spec = pl.BlockSpec((1, tile_h, wp, C),
                             lambda n, t: (n, t + 1, 0, 0))
    kernel = functools.partial(_kernel, kh=kh, kw=kw, w_out=W,
                               tile_h=tile_h)
    return pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[row_spec, halo_spec,
                  pl.BlockSpec((kh, kw, C), lambda n, t: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, tile_h, W, C),
                               lambda n, t: (n, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        interpret=interpret,
    )(xp, xp, w[:, :, 0, :])

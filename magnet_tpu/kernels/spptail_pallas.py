"""Pallas TPU kernel: fused PSM-Net SPP tail.

Fuses the tail of PSM-Net's feature extractor (reference
models/submodules/F_psmnet.py:66-68 and its use at :103-124):

    cat = concat([layer2_out(64), layer4_out(128), 4 SPP branches(4x32)])
    y   = ReLU(BN(conv3x3_320->128(cat)))
    out = conv1x1_128->feature_dim(y)

Run through XLA this costs a 320-channel concat materialization
(~0.25 ms/frame-set) plus a 3x3 conv at ~41% MFU. The kernel never
builds the concat: the 3x3 contraction is split by source — raw (64
lanes), skip (128) and the lane-packed SPP branches (128) each
contribute per-(dy, dx) dots into one f32 accumulator — then the folded
BN + ReLU + the 1x1 projection run in the same pass over row tiles.

Inputs stay in HBM (pl.ANY); each (frame, tile) step DMAs three
(tile+2)-row halo slabs. Top/bottom halo rows are zeroed in-kernel at
the edge tiles (zero padding semantics). The SPP branch maps arrive
already upsampled + lane-concatenated (order [win8, win16, win32,
win64] to match the reference concat order after raw/skip) — their
XLA materialization is cheap; the win here is the concat and the conv.

Weight layout: lastconv0 HWIO (3, 3, 320, Cmid) passed whole (0.74 MB
bf16, VMEM); per-(dy, dx) source blocks are sliced in-kernel.
Training and non-TPU backends keep the XLA path (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w


def _kernel(raw_hbm, skip_hbm, br_hbm, w0_ref, s_ref, t_ref, w1_ref,
            out_ref, raw_buf, skip_buf, br_buf, sems, *, H: int,
            tile_h: int):
    f = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    n_tiles = H // tile_h
    W = raw_buf.shape[1]
    cmid = w0_ref.shape[-1]

    # Halo DMA: rows [r0-1, r0+tile_h+1) clamped into the frame; the
    # out-of-frame halo row at the top/bottom edge is zeroed after. All
    # three sources are 128-lane (raw is zero-padded 64->128 by the
    # caller: Mosaic requires DMA slices lane-tile aligned).
    r0 = t * tile_h
    src0 = jnp.maximum(r0 - 1, 0)
    copies = []
    for i, (hbm, buf) in enumerate(
            ((raw_hbm, raw_buf), (skip_hbm, skip_buf), (br_hbm, br_buf))):
        c = pltpu.make_async_copy(
            hbm.at[f, pl.ds(jnp.minimum(src0, H - (tile_h + 2)),
                            tile_h + 2)],
            buf, sems.at[i])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    # Edge tiles: reposition so the valid rows sit at offset 1 and the
    # halo row is zero. For t == 0 the DMA read rows [0, tile+2) but row
    # index -1 must be zero: shift down by one and zero row 0. For the
    # last tile the DMA read [H-tile-2, H): shift up and zero the end.
    @pl.when(t == 0)
    def _top():
        for buf in (raw_buf, skip_buf, br_buf):
            shifted = jnp.concatenate(
                [jnp.zeros_like(buf[:1]), buf[:-1]], axis=0)
            buf[...] = shifted

    @pl.when(t == n_tiles - 1)
    def _bottom():
        for buf in (raw_buf, skip_buf, br_buf):
            shifted = jnp.concatenate(
                [buf[1:], jnp.zeros_like(buf[:1])], axis=0)
            buf[...] = shifted

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    acc = jnp.zeros((tile_h, W, cmid), f32)
    for dy in range(3):
        raw_s = raw_buf[pl.ds(dy, tile_h)]
        skip_s = skip_buf[pl.ds(dy, tile_h)]
        br_s = br_buf[pl.ds(dy, tile_h)]
        for dx in range(3):
            # w0 channel blocks: [raw(128, upper half zero) | skip(128)
            # | branches(128)]
            d = dx - 1
            acc = acc + dot(_shift_w(raw_s, d), w0_ref[dy, dx, :128])
            acc = acc + dot(_shift_w(skip_s, d), w0_ref[dy, dx, 128:256])
            acc = acc + dot(_shift_w(br_s, d), w0_ref[dy, dx, 256:])

    y = jnp.maximum(acc * s_ref[0][None, None, :]
                    + t_ref[0][None, None, :], 0.0)
    out_ref[0] = dot(y.astype(w1_ref.dtype), w1_ref[...]).astype(
        out_ref.dtype)


def spp_tail_fused(raw: jnp.ndarray, skip: jnp.ndarray, br: jnp.ndarray,
                   w0: jnp.ndarray, scale0: jnp.ndarray,
                   shift0: jnp.ndarray, w1: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """raw: (N, H, W, 64); skip: (N, H, W, 128); br: (N, H, W, 128) —
    the four upsampled SPP branches lane-packed in reference concat
    order; w0: (3, 3, 320, Cmid) lastconv0 kernel (input channel order
    raw | skip | branches); scale0/shift0: (Cmid,) folded BN; w1:
    (Cmid, Cout) 1x1 projection. Returns (N, H, W, Cout)."""
    N, H, W, c_raw = raw.shape
    c_skip = skip.shape[-1]
    cmid = w0.shape[-1]
    cout = w1.shape[-1]
    tile = _pick_tile(H, W, cout)
    dt = raw.dtype

    # Lane-align the 64-channel raw map and the matching weight rows
    # (zero rows multiply the padding; see _kernel).
    raw_p = jnp.concatenate(
        [raw, jnp.zeros(raw.shape[:-1] + (128 - c_raw,), dt)], axis=-1)
    w0_p = jnp.zeros((3, 3, 384, cmid), w0.dtype)
    w0_p = w0_p.at[:, :, :c_raw].set(w0[:, :, :c_raw])
    w0_p = w0_p.at[:, :, 128:128 + c_skip].set(
        w0[:, :, c_raw:c_raw + c_skip])
    w0_p = w0_p.at[:, :, 256:].set(w0[:, :, c_raw + c_skip:])

    kernel = functools.partial(_kernel, H=H, tile_h=tile)
    return pl.pallas_call(
        kernel,
        grid=(N, H // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, W, cout),
                               lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((tile + 2, W, 128), dt),
            pltpu.VMEM((tile + 2, W, c_skip), dt),
            pltpu.VMEM((tile + 2, W, br.shape[-1]), dt),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(raw_p, skip, br, w0_p.astype(dt),
      scale0.astype(jnp.float32)[None], shift0.astype(jnp.float32)[None],
      w1.astype(dt))


def _est_bytes(th: int, W: int, feature_dim: int = 64,
               itemsize: int = 2) -> int:
    """Static VMEM estimate for a row tile: three halo slabs (raw is
    lane-PADDED to 128, so 3x128 lanes resident), f32 accumulator,
    shifted-slab transients, weights. Real scoped allocation runs
    ~2-3 MB above this (per-op transients), so the budget below keeps
    that margin under the 16 MB limit — calibrated by the KITTI-shape
    failure: th=22 at W=304 estimated 15.0 MB and allocated 16.64."""
    slabs = (th + 2) * W * (128 + 128 + 128) * itemsize
    acc = th * W * 128 * 4
    trans = 3 * th * W * 128 * itemsize
    wts = (9 * 384 * 128 + 128 * feature_dim) * itemsize
    return slabs + acc + trans + wts


def _pick_tile(H: int, W: int, feature_dim: int = 64,
               itemsize: int = 2):
    """Largest row tile dividing H whose working set fits the budget
    (wide KITTI maps take a smaller tile than ScanNet's 24)."""
    for t in (24, 22, 20, 16, 15, 12, 11, 10, 8, 6, 5, 4):
        # H // t >= 2: the top/bottom edge re-shifts assume distinct
        # first/last tiles
        if (H % t == 0 and H // t >= 2 and
                _est_bytes(t, W, feature_dim, itemsize)
                <= 12 * 1024 * 1024):
            return t
    return None


def supported(x_shape, feature_dim: int, itemsize: int = 2) -> bool:
    """x_shape: layer4 output (N, H, W, 128)."""
    N, H, W, C = x_shape
    if C != 128 or feature_dim > 128:
        return False
    return _pick_tile(H, W, feature_dim, itemsize) is not None

"""Pallas TPU kernel: fused PSM-Net layer2_0 downsample block.

The first block of PSM-Net's layer2 (reference
models/submodules/F_psmnet.py:17-34 with stride 2 and a 1x1 downsample
projection) maps (N, 240, 320, 32) -> (N, 120, 160, 64):

    y   = ReLU(BN(conv3x3_s2_32->64(x)))
    y   = BN(conv3x3_64->64(y))
    out = y + BN(conv1x1_s2_32->64(x))

Through XLA this runs at 32/64-channel lane occupancy with relayout
copies on both sides of the adjacent fused chains (~0.6 ms/frame-set).
This kernel keeps everything packed: input pixel-QUAD layout
(240, 80, 128) = four 320-res pixels x 32ch per lane row (bytewise
identical to the layer1 chain's output), output pixel-PAIR layout
(120, 80, 128) = two 160-res pixels x 64ch (bytewise identical to the
layer2 chain's input). Nothing between the three kernels needs an XLA
relayout.

Stride-2 row decimation reads a 2*tile-row slab and drops odd rows via
a leading-dim (untiled) reshape — no strided sublane access. Stride-2
column taps become two dots per tap row (see pack_trans_conv1):
  group A (unshifted quad slab): in-group taps
    p'=0: (q=0)=w[dy,1], (q=1)=w[dy,2]
    p'=1: (q=1)=w[dy,0], (q=2)=w[dy,1], (q=3)=w[dy,2]
  group B (left-shifted slab, position pg holds group pg-1):
    p'=0: (q=3)=w[dy,0]
The 1x1 s2 projection picks q = 2p' from even rows (single dot).
conv2 is a standard pixel-pair conv (pack_conv_paired). Eval BN is
folded to scale/shift; training and non-TPU backends keep the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import (_PAIR_DX6, _shift_w,
                                                _tile_h, pack_conv_paired)


def pack_trans_conv1(w: jnp.ndarray) -> jnp.ndarray:
    """w: (3, 3, 32, 64) HWIO -> (3, 2*128, 128) [group A | group B]."""
    kh, kw, ci, co = w.shape
    a = jnp.zeros((kh, 4 * ci, 2 * co), w.dtype)
    for p in range(2):
        for dx in range(kw):
            c = 2 * p + dx - 1
            if 0 <= c < 4:
                a = a.at[:, c * ci:(c + 1) * ci,
                         p * co:(p + 1) * co].set(w[:, dx])
    b = jnp.zeros((kh, 4 * ci, 2 * co), w.dtype)
    b = b.at[:, 3 * ci:4 * ci, 0:co].set(w[:, 0])
    return jnp.concatenate([a, b], axis=1)


def pack_trans_proj(w: jnp.ndarray) -> jnp.ndarray:
    """w: (1, 1, 32, 64) -> (128, 128): q = 2p' picks the stride-2
    column inside the quad group."""
    ci, co = w.shape[2], w.shape[3]
    m = jnp.zeros((4 * ci, 2 * co), w.dtype)
    m = m.at[0:ci, 0:co].set(w[0, 0])
    m = m.at[2 * ci:3 * ci, co:2 * co].set(w[0, 0])
    return m


def _kernel(x_hbm, w1_ref, wp_ref, w2_ref, s_ref, t_ref, out_ref,
            in_buf, mid_buf, sem, *, H_out: int, tile_h: int):
    """Grid (N,). s_ref/t_ref rows: 0=conv1, 1=conv2, 2=proj (each
    (2*64,) f32, pair-lane duplicated)."""
    f32 = jnp.float32
    n_tiles = H_out // tile_h
    Wb = in_buf.shape[1]
    Cb = 128
    half = Cb // 2

    # whole quad map in, one zero halo row top and bottom
    in_buf[:1] = jnp.zeros_like(in_buf[:1])
    in_buf[2 * H_out + 1:] = jnp.zeros_like(in_buf[2 * H_out + 1:])
    copy = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0)], in_buf.at[pl.ds(1, 2 * H_out)], sem)
    copy.start()
    copy.wait()
    mid_buf[:1] = jnp.zeros_like(mid_buf[:1])
    mid_buf[H_out + 1:] = jnp.zeros_like(mid_buf[H_out + 1:])

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    def even_rows(start, n):
        slab = in_buf[pl.ds(start, 2 * n)]
        return slab.reshape(n, 2, Wb, Cb)[:, 0]

    def conv1_body(t, _):
        r0 = t * tile_h
        acc = jnp.zeros((tile_h, Wb, Cb), f32)
        for dy in range(3):
            # in rows 2h' + dy - 1, h' in [r0, r0+tile): buffer offset +1
            slab = even_rows(2 * r0 + dy, tile_h)
            acc = acc + dot(slab, w1_ref[dy, :Cb])
            acc = acc + dot(_shift_w(slab, -1), w1_ref[dy, Cb:])
        y = acc * s_ref[0][None, None, :] + t_ref[0][None, None, :]
        mid_buf[pl.ds(r0 + 1, tile_h)] = jnp.maximum(y, 0.0).astype(
            mid_buf.dtype)
        return ()

    def conv2_body(t, _):
        r0 = t * tile_h
        acc = jnp.zeros((tile_h, Wb, Cb), f32)
        for dy in range(3):
            slab = mid_buf[pl.ds(r0 + dy, tile_h)]
            left = _shift_w(slab, -1)
            right = _shift_w(slab, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 2)
            sel = lane < half
            lo = jnp.where(sel, slab, left)
            hi = jnp.where(sel, right, slab)
            acc = acc + dot(lo, w2_ref[dy, :Cb])
            acc = acc + dot(hi, w2_ref[dy, Cb:])
        y = acc * s_ref[1][None, None, :] + t_ref[1][None, None, :]
        # projection skip: input rows 2h' (buffer offset +1)
        proj = dot(even_rows(2 * r0 + 1, tile_h), wp_ref[...])
        y = y + proj * s_ref[2][None, None, :] + t_ref[2][None, None, :]
        out_ref[0, pl.ds(r0, tile_h)] = y.astype(out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, n_tiles, conv1_body, ())
    jax.lax.fori_loop(0, n_tiles, conv2_body, ())


def downsample_block(x: jnp.ndarray, w1, s1, t1, w2, s2, t2, wp, sp, tp,
                     interpret: bool = False) -> jnp.ndarray:
    """x: (N, H, W, 32) with H, W even; w1: (3, 3, 32, 64); w2:
    (3, 3, 64, 64); wp: (1, 1, 32, 64); s*/t*: (64,) folded BN.
    Returns (N, H/2, W/2, 64)."""
    N, H, W, C = x.shape
    H_out, W_out = H // 2, W // 2
    tile = _tile_h(H_out)
    dt = x.dtype

    xq = x.reshape(N, H, W // 4, 128)
    w1p = pack_trans_conv1(w1.astype(dt))
    w2p = pack_conv_paired(w2.astype(dt))
    wpp = pack_trans_proj(wp.astype(dt))
    s = jnp.stack([jnp.concatenate([a, a]) for a in (s1, s2, sp)])
    t = jnp.stack([jnp.concatenate([a, a]) for a in (t1, t2, tp)])

    kernel = functools.partial(_kernel, H_out=H_out, tile_h=tile)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H_out, W_out // 2, 128),
                               lambda f: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H_out, W_out // 2, 128), dt),
        scratch_shapes=[
            pltpu.VMEM((2 * H_out + 2, W // 4, 128), dt),
            pltpu.VMEM((H_out + 2, W_out // 2, 128), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xq, w1p, wpp, w2p, s.astype(jnp.float32), t.astype(jnp.float32))
    return out.reshape(N, H_out, W_out, 64)


def supported(x_shape, itemsize: int = 2) -> bool:
    """x_shape: layer1 output (N, H, W, 32), H and W even, W % 8 == 0
    (quad input groups and pair output groups)."""
    N, H, W, C = x_shape
    if C != 32 or H % 2 or W % 8:
        return False
    H_out = H // 2
    th = _tile_h(H_out)
    if th is None:
        return False
    vmem = ((2 * H_out + 2) * (W // 4) * 128 * itemsize   # quad in
            + (H_out + 2) * (W // 4) * 128 * itemsize     # pair mid
            + H_out * (W // 4) * 128 * itemsize           # out block
            + 2 * th * (W // 4) * 128 * itemsize          # slab transients
            + th * (W // 4) * 128 * 4                     # f32 acc
            + (2 * 3 * 256 + 128) * 128 * itemsize)       # weights
    return vmem <= 14 * 1024 * 1024
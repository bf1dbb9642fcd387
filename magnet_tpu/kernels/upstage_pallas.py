"""Pallas TPU kernel: fused DenseDepth decoder up-stage (up3).

One UpSampleBN stage (reference models/submodules/D_dense_depth.py:29-42)
at the decoder's widest spatial extent: bilinear 2x upsample
(align_corners=True) of the 512-channel map, merge with the thin encoder
skip, conv3x3 -> BN -> LeakyReLU twice. XLA runs the two 120x160 convs
at 50-58% MFU with the resize folded into the first conv's fusion; this
kernel streams row bands and keeps the whole stage in one pass:

  * vertical interpolation is done in XLA (2-term row mix with static
    indices — cheap and keeps the kernel's DMA row-aligned),
  * horizontal interpolation runs on the MXU: a static (W_out, W_src)
    bilinear matrix contracts each band row (gather-free, same idea as
    the cost-volume kernel),
  * conv_a = per-(dy, dx) dots of the upsampled slab (K=512) and the
    lane-padded skip slab (K=128) into one f32 accumulator; folded BN
    (conv bias absorbed) + LeakyReLU,
  * conv_b = per-(dy, dx) dots over the VMEM-resident mid rows; the mid
    halo rows at the true image edge are zeroed so conv_b sees the same
    zero padding as XLA.

Only engaged where the working set fits VMEM (ScanNet-shaped up3;
KITTI's 304-wide maps fall back to XLA). Training and non-TPU backends
keep the XLA path (no VJP).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w

_SLOPE = 0.01       # torch nn.LeakyReLU() default


def use_pallas_upstage() -> bool:
    """Opt-in (MAGNET_TPU_PALLAS_UP=1). MEASURED SLOWER end-to-end on
    v5e (28.0 vs 28.4 fps, 2026-08-17): the scoped-VMEM stack forces a
    6-row tile, whose 33% conv_a halo recompute hands back more than the
    fusion wins over XLA's 50-58%-MFU convs. Larger tiles OOM the
    16 MB scoped-VMEM stack (tile 10 hit 17.4 MB). Kept as a documented
    experiment; golden tests pin its semantics."""
    import os
    return os.environ.get("MAGNET_TPU_PALLAS_UP", "") == "1"


def _vmem_bytes(th: int, Ws: int, W: int, Cx: int, cm: int,
                itemsize: int) -> int:
    return ((th + 4) * Ws * Cx * itemsize      # vert slab
            + (th + 4) * W * Cx * itemsize     # upsampled slab
            + (th + 4) * W * 128 * itemsize    # skip slab
            + (th + 2) * W * cm * itemsize     # mid
            + (th + 2) * W * cm * 4            # f32 acc
            + th * W * cm * (4 + itemsize)     # acc2 + out block
            + 9 * (Cx + 128 + cm) * cm * itemsize)  # weights


def _tile(H: int, Ws: int = 80, W: int = 160, Cx: int = 512,
          cm: int = 256, itemsize: int = 2):
    """Largest row tile whose working set fits the VMEM budget."""
    # Budget calibrated against real v5e compiles: the scoped-VMEM stack
    # runs ~6-7 MB above this static estimate (double-buffered out
    # blocks, per-op transients), so the estimate must stay well under
    # the 16 MB limit. tile 10 at ScanNet (est 13.5 MB) OOMed at 17.4.
    for t in (12, 10, 8, 6, 4):
        if H % t == 0 and H // t >= 2 \
                and _vmem_bytes(t, Ws, W, Cx, cm,
                                itemsize) <= 10 * 1024 * 1024 + 512 * 1024:
            return t
    return None


def _w_interp_matrix(w_out: int, w_src: int) -> np.ndarray:
    """Static align_corners bilinear interpolation matrix (w_out, w_src)."""
    m = np.zeros((w_out, w_src), np.float32)
    for j in range(w_out):
        u = j * (w_src - 1) / (w_out - 1)
        i0 = min(int(np.floor(u)), w_src - 2)
        f = u - i0
        m[j, i0] += 1.0 - f
        m[j, i0 + 1] += f
    return m


def _leaky(y):
    return jnp.maximum(y, _SLOPE * y)


def _kernel(vert_hbm, skip_hbm, wu_ref, wau_ref, was_ref, wb_ref, s_ref,
            t_ref, out_ref, vert_s, up_buf, skip_s, mid_s, sems, *,
            H: int, tile_h: int):
    f = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    n_tiles = H // tile_h
    W = up_buf.shape[1]
    cm = wb_ref.shape[-1]
    r0 = t * tile_h

    # DMA tile+4 rows [r0-2, r0+tile+2) of both sources, start clamped
    # in-frame; edge tiles re-shift so out-of-frame rows are zero.
    start = jnp.clip(r0 - 2, 0, H - (tile_h + 4))
    copies = []
    for i, (hbm, buf) in enumerate(((vert_hbm, vert_s),
                                    (skip_hbm, skip_s))):
        c = pltpu.make_async_copy(
            hbm.at[f, pl.ds(start, tile_h + 4)], buf, sems.at[i])
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()

    @pl.when(t == 0)
    def _top():
        for buf in (vert_s, skip_s):
            z = jnp.zeros_like(buf[:2])
            buf[...] = jnp.concatenate([z, buf[:-2]], axis=0)

    @pl.when(t == n_tiles - 1)
    def _bottom():
        for buf in (vert_s, skip_s):
            z = jnp.zeros_like(buf[:2])
            buf[...] = jnp.concatenate([buf[2:], z], axis=0)

    # Horizontal bilinear on the MXU, one band row at a time.
    wu = wu_ref[...]
    for k in range(tile_h + 4):
        up_buf[k] = jax.lax.dot_general(
            wu, vert_s[k], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(up_buf.dtype)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    # conv_a over mid rows [r0-1, r0+tile+1). The W-shifts run on
    # 128-lane sub-slabs (aligned lane slices of the loaded slab): a
    # shifted copy of the full 512-channel slab is a ~2 MB transient and
    # several of them live at once — that blew the scoped-VMEM stack.
    cx = up_buf.shape[-1]
    acc = jnp.zeros((tile_h + 2, W, cm), f32)
    for dy in range(3):
        up_slab = up_buf[pl.ds(dy, tile_h + 2)]
        sk_slab = skip_s[pl.ds(dy, tile_h + 2)]
        for dx in range(3):
            d = dx - 1
            for c4 in range(cx // 128):
                sub = up_slab[:, :, c4 * 128:(c4 + 1) * 128]
                acc = acc + dot(_shift_w(sub, d),
                                wau_ref[dy, dx, c4 * 128:(c4 + 1) * 128])
            acc = acc + dot(_shift_w(sk_slab, d), was_ref[dy, dx])
    mid = _leaky(acc * s_ref[0][None, None, :] + t_ref[0][None, None, :])
    mid_s[...] = mid.astype(mid_s.dtype)

    # conv_b's zero padding at the true image edge: the computed mid
    # halo rows there must read as zeros.
    @pl.when(t == 0)
    def _mid_top():
        mid_s[:1] = jnp.zeros_like(mid_s[:1])

    @pl.when(t == n_tiles - 1)
    def _mid_bottom():
        mid_s[tile_h + 1:] = jnp.zeros_like(mid_s[tile_h + 1:])

    acc2 = jnp.zeros((tile_h, W, cm), f32)
    for dy in range(3):
        slab = mid_s[pl.ds(dy, tile_h)]
        for dx in range(3):
            for c2 in range(cm // 128):
                sub = slab[:, :, c2 * 128:(c2 + 1) * 128]
                acc2 = acc2 + dot(
                    _shift_w(sub, dx - 1),
                    wb_ref[dy, dx, c2 * 128:(c2 + 1) * 128])
    y = _leaky(acc2 * s_ref[1][None, None, :] + t_ref[1][None, None, :])
    out_ref[0] = y.astype(out_ref.dtype)


def upstage_fused(x: jnp.ndarray, skip: jnp.ndarray, wa_up, ba_up, wa_sk,
                  sa, ta, wb, bb, sb, tb,
                  interpret: bool = False) -> jnp.ndarray:
    """x: (N, Hs, Ws, Cx); skip: (N, 2Hs, 2Ws, Cs); wa_up: (3,3,Cx,Cm)
    (+ bias ba_up); wa_sk: (3,3,Cs,Cm) (no bias); wb: (3,3,Cm,Cm)
    (+ bias bb); sa/ta, sb/tb: (Cm,) folded BN scale/shift. Returns
    (N, 2Hs, 2Ws, Cm) = LeakyReLU(BN(conv_b(LeakyReLU(BN(conv_a(
    concat(upsample(x), skip)))))))."""
    N, Hs, Ws, Cx = x.shape
    H, W = skip.shape[1], skip.shape[2]
    Cs = skip.shape[-1]
    Cm = wb.shape[-1]
    dt = x.dtype
    th = _tile(H, Ws, W, Cx, Cm, jnp.dtype(dt).itemsize)

    # Vertical align_corners interpolation with static indices (XLA).
    r = np.arange(H)
    v = r * (Hs - 1) / (H - 1)
    i0 = np.minimum(np.floor(v).astype(np.int32), Hs - 2)
    fr = jnp.asarray((v - i0).astype(np.float32), dtype=dt)
    vert = (x[:, i0] * (1.0 - fr)[None, :, None, None]
            + x[:, i0 + 1] * fr[None, :, None, None])

    skip_p = jnp.concatenate(
        [skip.astype(dt),
         jnp.zeros(skip.shape[:-1] + (128 - Cs,), dt)], axis=-1)
    was_p = jnp.zeros((3, 3, 128, Cm), wa_sk.dtype)
    was_p = was_p.at[:, :, :Cs].set(wa_sk)

    wu = jnp.asarray(_w_interp_matrix(W, Ws), dtype=dt)
    # absorb conv biases into the folded BN shifts
    ta_eff = ta + sa * ba_up
    tb_eff = tb + sb * bb
    s = jnp.stack([sa, sb]).astype(jnp.float32)
    tt = jnp.stack([ta_eff, tb_eff]).astype(jnp.float32)

    kernel = functools.partial(_kernel, H=H, tile_h=th)
    return pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, Cm), lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, Cm), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 4, Ws, Cx), dt),
            pltpu.VMEM((th + 4, W, Cx), dt),
            pltpu.VMEM((th + 4, W, 128), dt),
            pltpu.VMEM((th + 2, W, Cm), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(vert, skip_p, wu, wa_up.astype(dt), was_p.astype(dt),
      wb.astype(dt), s, tt)


def supported(x_shape, skip_shape, itemsize: int = 2) -> bool:
    N, Hs, Ws, Cx = x_shape
    _, H, W, Cs = skip_shape
    if Cx != 512 or Cs > 128 or H != 2 * Hs or W != 2 * Ws:
        return False
    return _tile(H, Ws, W, Cx, 256, itemsize) is not None
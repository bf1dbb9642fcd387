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
  * conv_b = per-(dy, dx) dots over the VMEM-resident mid rows.

RING-BUFFERED streaming (v2): the input windows (vertical-interp rows,
upsampled rows, skip rows) and the conv_a output ("mid") window persist
in scratch across grid steps — TPU grids run sequentially — so each step
DMAs only tile_h new input rows, interpolates only tile_h new rows, and
computes every mid row exactly ONCE (the first kernel recomputed a
2-row conv_a halo per tile: 33% waste at the VMEM-forced 6-row tile).
The 2-row overlap between consecutive windows is carried by shifting
the buffer tails into the heads at the start of each step; the t == 0
step seeds the window (2-row head DMA + one extra mid row) and the last
step re-shifts the bottom-clamped DMA and zeroes the out-of-image rows
so both convs see XLA's zero padding.

Only engaged where the working set fits VMEM: ScanNet-shaped up3 runs
at tile 8, KITTI's 304-wide maps squeeze in at tile 4 (bf16; f32 traces
fall back). Training and non-TPU backends keep the XLA path (no VJP).
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
    """MAGNET_TPU_PALLAS_UP=0 forces the XLA path. The v2 ring kernel
    measured NEUTRAL end-to-end on v5e (31.50 vs 31.45 fps): the kernel
    itself runs up3 at ~82% MXU (2.15 ms vs XLA's 3.26), but the up2
    producer fusions upstream lose the difference to the relayout the
    custom-call boundary forces ({3,0,2,1}-preferring conv fusions ->
    row-major operand). Kept on: the interior is the right place to grow
    (fusing the heads amortizes the boundary), and it lifts KITTI too."""
    import os
    return os.environ.get("MAGNET_TPU_PALLAS_UP", "1") == "1"


def _vmem_bytes(th: int, Ws: int, W: int, Cx: int, cm: int,
                itemsize: int) -> int:
    return ((th + 2) * Ws * Cx * itemsize      # vert ring
            + (th + 2) * W * Cx * itemsize     # upsampled ring
            + (th + 2) * W * 128 * itemsize    # skip ring
            + (th + 2) * W * cm * itemsize     # mid ring
            + th * W * cm * 8                  # f32 acc + acc2
            + th * W * cm * 2 * itemsize       # double-buffered out
            + 9 * (Cx + 128 + cm) * cm * itemsize)  # weights


def _tile(H: int, Ws: int = 80, W: int = 160, Cx: int = 512,
          cm: int = 256, itemsize: int = 2):
    """Largest row tile whose working set fits the VMEM budget."""
    # Budget calibrated against real v5e compiles: the scoped-VMEM stack
    # runs a few MB above this static estimate (per-op transients), so
    # the estimate must stay under the 16 MB limit with margin. The v1
    # kernel's tile-10 static 13.5 MB allocated 17.4 and OOMed; the v2
    # ring kernel's tile-8 static 11.8 MB compiles and runs.
    for t in (8, 6, 4):
        if H % t == 0 and t >= 4 \
                and _vmem_bytes(t, Ws, W, Cx, cm,
                                itemsize) <= 12 * 1024 * 1024:
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
    th = tile_h
    n_tiles = H // th
    W = up_buf.shape[1]
    cx = up_buf.shape[-1]
    cm = wb_ref.shape[-1]
    r0 = t * th

    # ---- ring shift: rows [r0, r0+2) of every window are the previous
    # step's tail (buffer row j holds absolute row r0 + j; mid row j
    # holds absolute mid row r0 - 1 + j).
    @pl.when(t > 0)
    def _shift():
        for buf in (vert_s, up_buf, skip_s, mid_s):
            buf[0:2] = buf[th:th + 2]

    # ---- DMA the th NEW input rows [r0+2, r0+th+2), bottom-clamped.
    # (A transposed (H, Ws, N, Cx) operand matching the XLA producer's
    # preferred physical layout was tried to kill the boundary relayout:
    # Mosaic cannot slice the sublane (N) dim at a dynamic index.)
    start = jnp.minimum(r0 + 2, H - th)
    copies = []
    for i, (src, buf) in enumerate(
            ((vert_hbm.at[f, pl.ds(start, th)], vert_s),
             (skip_hbm.at[f, pl.ds(start, th)], skip_s))):
        c = pltpu.make_async_copy(src, buf.at[pl.ds(2, th)], sems.at[i])
        c.start()
        copies.append(c)

    @pl.when(t == 0)
    def _seed_head():
        # no previous tail to carry: rows [0, 2) come from HBM.
        for i, (src, buf) in enumerate(
                ((vert_hbm.at[f, pl.ds(0, 2)], vert_s),
                 (skip_hbm.at[f, pl.ds(0, 2)], skip_s))):
            c = pltpu.make_async_copy(src, buf.at[pl.ds(0, 2)],
                                      sems.at[2 + i])
            c.start()
            c.wait()

    for c in copies:
        c.wait()

    @pl.when(t == n_tiles - 1)
    def _bottom():
        # the clamped DMA loaded absolute [H-th, H) into [2, th+2); the
        # window wants [r0+2, H) there plus 2 zero out-of-image rows.
        for buf in (vert_s, skip_s):
            vals = buf[2:th + 2]
            buf[2:th + 2] = jnp.concatenate(
                [vals[2:], jnp.zeros_like(vals[:2])], axis=0)

    # ---- horizontal bilinear on the MXU for the new rows only.
    wu = wu_ref[...]

    def interp(k):
        up_buf[k] = jax.lax.dot_general(
            wu, vert_s[k], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(up_buf.dtype)

    for k in range(2, th + 2):
        interp(k)

    @pl.when(t == 0)
    def _seed_interp():
        for k in range(2):
            interp(k)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    def conv_a(up_rows, skip_rows, zero_top: int):
        """conv_a over aligned slabs; zero_top marks how many leading dy
        taps fall above the image (t == 0 seed row only)."""
        n = up_rows[-1].shape[0]
        acc = jnp.zeros((n, W, cm), f32)
        for dy in range(3):
            if dy < zero_top:
                continue
            up_slab = up_rows[dy]
            sk_slab = skip_rows[dy]
            for dx in range(3):
                d = dx - 1
                for c4 in range(cx // 128):
                    sub = up_slab[:, :, c4 * 128:(c4 + 1) * 128]
                    acc = acc + dot(_shift_w(sub, d),
                                    wau_ref[dy, dx,
                                            c4 * 128:(c4 + 1) * 128])
                acc = acc + dot(_shift_w(sk_slab, d), was_ref[dy, dx])
        return _leaky(acc * s_ref[0][None, None, :]
                      + t_ref[0][None, None, :])

    # ---- conv_a: th new mid rows [r0+1, r0+th+1) — each computed ONCE.
    mid_new = conv_a([up_buf[dy:dy + th] for dy in range(3)],
                     [skip_s[dy:dy + th] for dy in range(3)], 0)
    mid_s[2:th + 2] = mid_new.astype(mid_s.dtype)

    @pl.when(t == 0)
    def _seed_mid():
        # mid row 0 (inputs: zero row above the image, rows 0 and 1) and
        # the zero mid row standing in for conv_b's top padding.
        row0 = conv_a([None, up_buf[0:1], up_buf[1:2]],
                      [None, skip_s[0:1], skip_s[1:2]], 1)
        mid_s[1:2] = row0.astype(mid_s.dtype)
        mid_s[0:1] = jnp.zeros_like(mid_s[0:1])

    @pl.when(t == n_tiles - 1)
    def _mid_bottom():
        # absolute mid row H is below the image: conv_b zero padding.
        mid_s[th + 1:th + 2] = jnp.zeros_like(mid_s[th + 1:th + 2])

    # ---- conv_b over the full mid window -> output rows [r0, r0+th).
    acc2 = jnp.zeros((th, W, cm), f32)
    for dy in range(3):
        slab = mid_s[dy:dy + th]
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
            + x[:, i0 + 1] * fr[None, :, None, None])  # (N, H, Ws, Cx)

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
    out_t = pl.pallas_call(
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
            pltpu.VMEM((th + 2, Ws, Cx), dt),
            pltpu.VMEM((th + 2, W, Cx), dt),
            pltpu.VMEM((th + 2, W, 128), dt),
            pltpu.VMEM((th + 2, W, Cm), dt),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
    )(vert, skip_p, wu, wa_up.astype(dt), was_p.astype(dt),
      wb.astype(dt), s, tt)
    return out_t


def supported(x_shape, skip_shape, itemsize: int = 2) -> bool:
    N, Hs, Ws, Cx = x_shape
    _, H, W, Cs = skip_shape
    if Cx != 512 or Cs > 128 or H != 2 * Hs or W != 2 * Ws:
        return False
    # Mosaic memref slices along the width (sublane) dim must be 8-aligned
    # (small eval shapes like Ws=12 fail to compile otherwise).
    if Ws % 8 != 0:
        return False
    return _tile(H, Ws, W, Cx, 256, itemsize) is not None

"""Pallas TPU kernel: streaming 3x3 conv + folded BN + LeakyReLU, and the
fused decoder up2 stage built from it.

The decoder's up2 stage (reference models/submodules/D_dense_depth.py:29-42
at the 1024->512 width) runs its two 3x3 convs at ~53% MFU under XLA — the
conv fusions carry the bilinear-resize/concat/activation epilogues and pick
batch-interleaved layouts. A single fused kernel like up3's
(`upstage_pallas.py`) cannot work here: conv_a's weights alone are
(3,3,1088,512) ~ 10 MB and the conv_b weights another 4.7 MB, past the
scoped-VMEM budget once rings and accumulators join.

Instead up2 is built from THREE instances of one generic ring-buffered
streamer, each VMEM-light (<8 MB):

  mid   = concat(stream(up, skip, wa[..., :256]),      # out-ch half 0
                 stream(up, skip, wa[..., 256:]), -1)  # out-ch half 1
  out   = stream(mid, None, wb)

  * out-channel splitting keeps each call's resident weights at 4.7 MB
    with full f32 accumulation (no inter-call partial-sum round trip;
    the upsampled input is re-streamed, ~10 MB of extra HBM reads),
  * each call streams row bands through a persistent (tile_h + 2)-row
    input ring (the 2-row conv halo is carried across grid steps, every
    output row computed once — the upstage v2 ring discipline),
  * the 2x bilinear upsample stays in XLA (`resize_bilinear_align_corners`
    is already two matmuls); custom-call boundaries between the three
    streams are row-major -> row-major, so no relayouts appear,
  * eval BatchNorm and the conv bias fold into a per-channel f32
    scale/shift epilogue with the torch-default LeakyReLU slope.

Training and non-TPU backends keep the module path (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w

_SLOPE = 0.01


def use_convstream() -> bool:
    import os
    return os.environ.get("MAGNET_TPU_PALLAS_UP2", "1") == "1"


def _vmem_bytes(th: int, W: int, cin: int, cs: int, cout: int,
                itemsize: int) -> int:
    return ((th + 2) * W * cin * itemsize          # input ring
            + ((th + 2) * W * 128 * itemsize if cs else 0)   # skip ring
            + 9 * (cin + (128 if cs else 0)) * cout * itemsize  # weights
            + th * W * cout * 4                    # f32 accumulator
            + 2 * th * W * cout * itemsize)        # double-buffered out


def _tile(H: int, W: int, cin: int, cs: int, cout: int,
          itemsize: int = 2, budget: int = 10 * 1024 * 1024):
    for th in (8, 6, 4, 2):
        if H % th == 0 and H // th >= 2 and _vmem_bytes(
                th, W, cin, cs, cout, itemsize) <= budget:
            return th
    return None


def _leaky(y):
    return jnp.maximum(y, _SLOPE * y)


def _kernel(x_hbm, skip_hbm, w_ref, wsk_ref, s_ref, t_ref, out_ref,
            x_ring, skip_ring, sems, *, H: int, tile_h: int,
            act: bool, has_skip: bool):
    """One grid step: output rows [r0, r0+th) of conv3x3(x) [+
    conv3x3(skip)], scale/shift epilogue, LeakyReLU if act.

    Ring row j holds absolute input row r0 - 1 + j (rows -1 and H are
    zero padding)."""
    f = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_h
    n_tiles = H // th
    W = x_ring.shape[1]
    cin = x_ring.shape[-1]
    cout = w_ref.shape[-1]
    f32 = jnp.float32
    r0 = t * th
    rings = [(x_hbm, x_ring, 0)]
    if has_skip:
        rings.append((skip_hbm, skip_ring, 1))

    # carry the 2-row halo from the previous step
    @pl.when(t > 0)
    def _shift():
        for _, ring, _i in rings:
            ring[0:2] = ring[th:th + 2]

    # DMA the th new rows [r0+1, r0+th+1), bottom-clamped
    start = jnp.minimum(r0 + 1, H - th)
    copies = []
    for hbm, ring, i in rings:
        c = pltpu.make_async_copy(hbm.at[f, pl.ds(start, th)],
                                  ring.at[pl.ds(2, th)], sems.at[i])
        c.start()
        copies.append(c)

    @pl.when(t == 0)
    def _seed_head():
        # rows [-1, 1): a zero row and row 0
        for hbm, ring, i in rings:
            c = pltpu.make_async_copy(hbm.at[f, pl.ds(0, 1)],
                                      ring.at[pl.ds(1, 1)], sems.at[2 + i])
            c.start()
            c.wait()
            ring[0:1] = jnp.zeros_like(ring[0:1])

    for c in copies:
        c.wait()

    @pl.when(t == n_tiles - 1)
    def _bottom():
        # the clamped DMA loaded [H-th, H) into [2, th+2); the window
        # wants [r0+1, H) there plus the zero row standing in for row H
        for _, ring, _i in rings:
            vals = ring[2:th + 2]
            ring[2:th + 2] = jnp.concatenate(
                [vals[1:], jnp.zeros_like(vals[:1])], axis=0)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    acc = jnp.zeros((th, W, cout), f32)
    for dy in range(3):
        slab = x_ring[dy:dy + th]
        for dx in range(3):
            sh = _shift_w(slab, dx - 1)
            for c0 in range(cin // 128):
                acc = acc + dot(sh[:, :, c0 * 128:(c0 + 1) * 128],
                                w_ref[dy, dx, c0 * 128:(c0 + 1) * 128])
        if has_skip:
            sslab = skip_ring[dy:dy + th]
            for dx in range(3):
                acc = acc + dot(_shift_w(sslab, dx - 1), wsk_ref[dy, dx])

    y = acc * s_ref[0][None, None, :] + t_ref[0][None, None, :]
    if act:
        y = _leaky(y)
    out_ref[0] = y.astype(out_ref.dtype)


def conv3x3_stream(x: jnp.ndarray, w, scale, shift, skip=None,
                   w_skip=None, act: bool = True, tile_h=None,
                   interpret: bool = False) -> jnp.ndarray:
    """Streaming SAME 3x3 conv: LeakyReLU(conv(x)[+conv(skip)]*scale+shift).

    x: (N, H, W, Cin) with Cin % 128 == 0; w: (3, 3, Cin, Cout); skip:
    (N, H, W, 128) (caller lane-pads); w_skip: (3, 3, 128, Cout);
    scale/shift: (Cout,) f32 folded BN (conv bias pre-absorbed into
    shift). Returns (N, H, W, Cout) in x.dtype."""
    N, H, W, cin = x.shape
    cout = w.shape[-1]
    dt = x.dtype
    # interpret mode (tests, CPU) has no scoped-VMEM limit
    th = tile_h or _tile(H, W, cin, 0 if skip is None else 128, cout,
                         jnp.dtype(dt).itemsize,
                         budget=(1 << 40) if interpret
                         else 10 * 1024 * 1024)

    kernel = functools.partial(_kernel, H=H, tile_h=th,
                               act=act, has_skip=skip is not None)
    f32 = jnp.float32
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    scratch = [pltpu.VMEM((th + 2, W, cin), dt),
               pltpu.VMEM((th + 2, W, 128), dt)
               if skip is not None else pltpu.VMEM((8, 128), dt),
               pltpu.SemaphoreType.DMA((4,))]
    if skip is None:
        skip = jnp.zeros((1, 1), dt)            # unused placeholder
        w_skip = jnp.zeros((1, 1), dt)
    out = pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, W, cout), lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), dt),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, skip.astype(dt), w.astype(dt), w_skip.astype(dt),
      scale.astype(f32)[None], shift.astype(f32)[None])
    return out


def up2_supported(x_shape, skip_shape, itemsize: int = 2) -> bool:
    N, Hs, Ws, Cx = x_shape
    _, H, W, Cs = skip_shape
    if Cx != 1024 or Cs > 128 or H != 2 * Hs or W != 2 * Ws:
        return False
    return (_tile(H, W, Cx, 128, 256, itemsize) is not None
            and _tile(H, W, 512, 0, 512, itemsize) is not None)


def up2_fused(up: jnp.ndarray, skip: jnp.ndarray, wa, ba, wask, sa, ta,
              wb, bb, sb, tb, interpret: bool = False) -> jnp.ndarray:
    """Fused UpSampleBN at the up2 width. up: the ALREADY upsampled
    (N, H, W, 1024) map (XLA matmul resize); skip: (N, H, W, Cs<=128);
    wa: (3,3,1024,512) conv_a_up (+ bias ba); wask: (3,3,Cs,512);
    wb: (3,3,512,512) conv_b (+ bias bb); sa/ta, sb/tb: folded BN."""
    dt = up.dtype
    Cs = skip.shape[-1]
    skip_p = jnp.concatenate(
        [skip.astype(dt),
         jnp.zeros(skip.shape[:-1] + (128 - Cs,), dt)], axis=-1)
    wask_p = jnp.zeros((3, 3, 128, wask.shape[-1]), wask.dtype)
    wask_p = wask_p.at[:, :, :Cs].set(wask)
    ta_eff = (ta + sa * ba).astype(jnp.float32)
    tb_eff = (tb + sb * bb).astype(jnp.float32)
    halves = [
        conv3x3_stream(up, wa[..., h * 256:(h + 1) * 256],
                       sa[h * 256:(h + 1) * 256],
                       ta_eff[h * 256:(h + 1) * 256],
                       skip=skip_p, w_skip=wask_p[..., h * 256:(h + 1) * 256],
                       interpret=interpret)
        for h in range(2)]
    mid = jnp.concatenate(halves, axis=-1)
    return conv3x3_stream(mid, wb, sb, tb_eff, interpret=interpret)

"""Pallas TPU kernel: streaming PSM-Net BasicBlock (row-ring residual).

The whole-map PSM chains (`psmstage_pallas.py`) need both ping-pong
feature buffers VMEM-resident and so exclude the KITTI eval shapes
(88x304 and 176x608 maps, F_psmnet.py stages at 352x1216 inputs). This
kernel runs ONE stride-1 BasicBlock (reference F_psmnet.py:28-34:
conv3x3 -> BN -> ReLU -> conv3x3 -> BN -> + residual, NO activation
after the sum, dilation 1 or 2 with padding == dilation) as a row
stream, the up-stage ring discipline (`upstage_pallas.py` v2 /
`convstream_pallas.py`) extended to two chained convs:

  * a persistent (tile + 2d)-row INPUT ring and a (tile + 2d)-row MID
    ring carry the dilation-halo across grid steps — every mid row is
    computed exactly once, one HBM read of x and one write of out per
    row (the residual rides the input ring for free),
  * eval BatchNorm folds to per-channel f32 scale/shift epilogues,
  * dilation-d taps are static slab offsets (rows) and +-d sublane
    shifts (columns) of the rings — no relayouts, no halo recompute,
  * rows above/below the image are materialized as ZERO rows in the
    rings (the convs' zero padding), top rows seeded at tile 0, bottom
    rows rewritten at the last tile.

Channels lane-pad to 128 (Mosaic DMA slices must be lane-tile aligned);
zero weight rows/columns keep the pad lanes exactly zero through both
convs and the residual. Training and non-TPU backends keep the module
path (no VJP).

OPT-IN (`MAGNET_TPU_PALLAS_RST=1`): measured SLOWER than XLA at the
KITTI eval shape on v5e — 23.0 vs 19.5 ms for the 5-frame PSM pass.
At 88x304+ the maps are large enough that XLA's conv fusions run
efficiently, and 19 per-block custom calls' ring setup/boundary costs
outweigh the fused epilogues (the whole-map ScanNet chains win for the
opposite reason: small maps are launch/format bound under XLA).
Golden-tested and kept for shapes where the balance may differ.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w


def use_resstream() -> bool:
    """Opt-in: see module doc (measured slower than XLA at KITTI)."""
    import os
    return os.environ.get("MAGNET_TPU_PALLAS_RST", "") == "1"


def _kernel(x_hbm, w1_ref, s1_ref, t1_ref, w2_ref, s2_ref, t2_ref,
            out_ref, x_ring, mid_ring, sems, *, H: int, tile_h: int,
            dil: int):
    """Output rows [r0, r0+th). x_ring position j holds input row
    r0 + j - 0 for j in [0, th+2d) -> rows [r0, r0+th+2d); mid_ring
    position j holds mid row r0 - d + j -> rows [r0-d, r0+th+d)."""
    f = pl.program_id(0)
    t = pl.program_id(1)
    th = tile_h
    d = dil
    n_tiles = H // th
    W = x_ring.shape[1]
    C = x_ring.shape[-1]
    f32 = jnp.float32
    r0 = t * th

    # carry the 2d-row halos from the previous step
    @pl.when(t > 0)
    def _shift():
        x_ring[0:2 * d] = x_ring[th:th + 2 * d]
        mid_ring[0:2 * d] = mid_ring[th:th + 2 * d]

    # DMA the th new input rows [r0+2d, r0+th+2d), bottom-clamped
    start = jnp.minimum(r0 + 2 * d, H - th)
    c = pltpu.make_async_copy(x_hbm.at[f, pl.ds(start, th)],
                              x_ring.at[pl.ds(2 * d, th)], sems.at[0])
    c.start()

    @pl.when(t == 0)
    def _seed_top():
        # input rows [0, 2d) into positions [0, 2d)
        c0 = pltpu.make_async_copy(x_hbm.at[f, pl.ds(0, 2 * d)],
                                   x_ring.at[pl.ds(0, 2 * d)], sems.at[1])
        c0.start()
        c0.wait()

    c.wait()

    @pl.when(t == n_tiles - 1)
    def _bottom():
        # the clamped DMA loaded [H-th, H) into [2d, 2d+th); the window
        # wants [r0+2d, H) there plus 2d zero rows standing in for rows
        # >= H (the convs' bottom zero padding)
        vals = x_ring[2 * d:2 * d + th]
        x_ring[2 * d:2 * d + th] = jnp.concatenate(
            [vals[2 * d:], jnp.zeros_like(vals[:2 * d])], axis=0)

    def conv3(ring, off, w_ref, n_rows):
        acc = jnp.zeros((n_rows, W, C), f32)
        for dy in range(3):
            slab = ring[off + dy * d:off + dy * d + n_rows]
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    _shift_w(slab, (dx - 1) * d), w_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=f32)
        return acc

    @pl.when(t == 0)
    def _seed_mid_top():
        # mid rows [-d, 0) are zero padding; mid rows [0, d) need input
        # rows [-d, 2d): build the d zero rows explicitly
        mid_ring[0:d] = jnp.zeros_like(mid_ring[0:d])
        xpad = jnp.concatenate(
            [jnp.zeros_like(x_ring[:d]), x_ring[0:2 * d]], axis=0)
        acc = jnp.zeros((d, W, C), f32)
        for dy in range(3):
            slab = xpad[dy * d:dy * d + d]
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    _shift_w(slab, (dx - 1) * d), w1_ref[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=f32)
        y = acc * s1_ref[0][None, None, :] + t1_ref[0][None, None, :]
        mid_ring[d:2 * d] = jnp.maximum(y, 0.0).astype(mid_ring.dtype)

    # new mid rows [r0+d, r0+th+d) from input rows [r0, r0+th+2d)
    y1 = conv3(x_ring, 0, w1_ref, th) * s1_ref[0][None, None, :] \
        + t1_ref[0][None, None, :]
    mid_ring[2 * d:2 * d + th] = jnp.maximum(y1, 0.0).astype(mid_ring.dtype)

    @pl.when(t == n_tiles - 1)
    def _mid_bottom():
        # mid rows >= H are zero padding for conv2
        mid_ring[th + d:th + 2 * d] = jnp.zeros_like(
            mid_ring[th + d:th + 2 * d])

    # out rows [r0, r0+th) from mid rows [r0-d, r0+th+d) + residual
    y2 = conv3(mid_ring, 0, w2_ref, th) * s2_ref[0][None, None, :] \
        + t2_ref[0][None, None, :]
    out_ref[0] = (y2 + x_ring[0:th].astype(f32)).astype(out_ref.dtype)


def _vmem_bytes(th: int, W: int, d: int, itemsize: int) -> int:
    return (2 * (th + 2 * d) * W * 128 * itemsize   # input + mid rings
            + th * W * 128 * 4                      # f32 accumulator
            + 3 * th * W * 128 * itemsize           # shifted-slab transients
            + 2 * th * W * 128 * itemsize           # double-buffered out
            + 2 * 9 * 128 * 128 * itemsize)         # weights


def _tile(H: int, W: int, d: int, itemsize: int,
          budget: int = 10 * 1024 * 1024):
    for th in (16, 8, 6, 4):
        if (H % th == 0 and H // th >= 2 and th >= 2 * d
                and _vmem_bytes(th, W, d, itemsize) <= budget):
            return th
    return None


def supported(x_shape, dilation: int = 1, itemsize: int = 2) -> bool:
    """x_shape: (N, H, W, C) block input; C <= 128, stride-1 blocks only."""
    N, H, W, C = x_shape
    if C > 128 or dilation not in (1, 2) or W < 2 * dilation + 1:
        return False
    return _tile(H, W, dilation, itemsize) is not None


def resblock_stream(x: jnp.ndarray, w1, sc1, sh1, w2, sc2, sh2,
                    dilation: int = 1, interpret: bool = False
                    ) -> jnp.ndarray:
    """Streaming BasicBlock: BN2(conv2(relu(BN1(conv1(x))))) + x.

    x: (N, H, W, C), C <= 128; w1/w2: (3, 3, C, C); sc/sh: (C,) f32
    folded eval-BN scale/shift. Returns (N, H, W, C) in x.dtype."""
    N, H, W, C = x.shape
    dt = x.dtype
    f32 = jnp.float32
    d = dilation
    th = _tile(H, W, d, jnp.dtype(dt).itemsize,
               budget=(1 << 40) if interpret else 10 * 1024 * 1024)

    if C < 128:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - C)))

    def pad_w(w, sc, sh):
        w = jnp.pad(w.astype(dt),
                    ((0, 0), (0, 0), (0, 128 - C), (0, 128 - C)))
        sc = jnp.pad(sc.astype(f32), (0, 128 - C))
        sh = jnp.pad(sh.astype(f32), (0, 128 - C))
        return w, sc[None], sh[None]

    w1p, sc1p, sh1p = pad_w(w1, sc1, sh1)
    w2p, sc2p, sh2p = pad_w(w2, sc2, sh2)

    kernel = functools.partial(_kernel, H=H, tile_h=th, dil=d)
    out = pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, th, W, 128), lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, 128), dt),
        scratch_shapes=[pltpu.VMEM((th + 2 * d, W, 128), dt),
                        pltpu.VMEM((th + 2 * d, W, 128), dt),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(x.astype(dt), w1p, sc1p, sh1p, w2p, sc2p, sh2p)
    return out[..., :C]

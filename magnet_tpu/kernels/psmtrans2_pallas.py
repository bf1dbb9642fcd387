"""Pallas TPU kernel: fused PSM-Net layer3_0 channel-expansion block.

The first block of PSM-Net's layer3 (reference models/submodules/
F_psmnet.py:17-34 with stride 1 and a 1x1 projection because the channel
count doubles) maps (N, 120, 160, 64) -> (N, 120, 160, 128):

    y   = ReLU(BN(conv3x3_64->128(x)))
    y   = BN(conv3x3_128->128(y))
    out = y + BN(conv1x1_64->128(x))

This is the last XLA-executed block in the PSM trunk at ScanNet shapes:
the layer2 chain upstream emits the pixel-PAIR packed layout and the
layer3 chain downstream wants natural 128-lane rows, so XLA runs the
three convs at 64-channel occupancy with relayout copies on both sides
(~0.5 ms/frame-set).

Layout scheme — even/odd output PLANES:
  * input: the layer2 pair layout (H, W/2, 128), lane = (pixel parity,
    channel); bytewise identical to the layer2 chain's output buffer.
  * intermediates: both convs accumulate a (rows, W/2, 256) tensor whose
    lane halves are the EVEN-pixel plane (out columns 2g) and the
    ODD-pixel plane (columns 2g+1). Every dy needs only two dots:
    a fully dense "in-place" matrix (all four parity->parity taps that
    stay in group g) and a half-dense "select" matrix fed by a
    lane-selected mix of the +-1 group-shifted slabs (the two taps that
    cross a group boundary). No lane rotates (Mosaic cannot rotate
    bf16); only whole-group sublane shifts + lane-half selects.
  * epilogue: the planes interleave to natural (rows, W, 128) on the
    MXU — one (W, W) 0/1 permutation matrix times the sublane-stacked
    [E; O] block per row (a lane-dim reshape would lower through
    Mosaic's single-tile gathers).

conv1 output rows are carried across row tiles in a persistent
(tile+2)-row VMEM ring (grid steps run sequentially), so every mid row
is computed exactly once — the upstage_pallas v2 discipline. Eval BN is
folded to scale/shift; training and non-TPU backends keep the XLA path
(no VJP).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w


def pack_p2n_conv1(w: jnp.ndarray) -> jnp.ndarray:
    """w: (3, 3, 64, 128) HWIO -> (3, 4*64, 256) = [U; S] row blocks.

    U (dense, unshifted pair slab): lane rows (p, ci), out cols
    (plane, co). Even plane (pixel 2g): p=0 is the center tap w[dy,1],
    p=1 the right tap w[dy,2]. Odd plane (pixel 2g+1): p=0 is the left
    tap w[dy,0], p=1 the center w[dy,1].
    S (select slab: lanes<64 hold group g+1's p=0 pixel = column 2g+2,
    lanes>=64 hold group g-1's p=1 pixel = column 2g-1): the two
    cross-group taps — odd plane w[dy,2] and even plane w[dy,0]."""
    kh, kw, ci, co = w.shape
    u = jnp.zeros((kh, 2 * ci, 2 * co), w.dtype)
    u = u.at[:, 0:ci, 0:co].set(w[:, 1])
    u = u.at[:, ci:2 * ci, 0:co].set(w[:, 2])
    u = u.at[:, 0:ci, co:2 * co].set(w[:, 0])
    u = u.at[:, ci:2 * ci, co:2 * co].set(w[:, 1])
    s = jnp.zeros((kh, 2 * ci, 2 * co), w.dtype)
    s = s.at[:, 0:ci, co:2 * co].set(w[:, 2])
    s = s.at[:, ci:2 * ci, 0:co].set(w[:, 0])
    return jnp.concatenate([u, s], axis=1)


def pack_p2n_conv2(w: jnp.ndarray) -> jnp.ndarray:
    """w: (3, 3, 128, 128) -> (3, 4*128, 256) = [U; S] row blocks over
    the even/odd PLANE lanes. In-plane adjacency: for the even plane
    (pixel 2g) the same-group even lane is the center tap and the odd
    lane (pixel 2g+1) the right tap; for the odd plane the even lane is
    the left tap and the odd lane the center. Cross-group: the odd
    plane's right tap lives in group g+1's even lanes, the even plane's
    left tap in group g-1's odd lanes (the S select slab)."""
    kh, kw, c, co = w.shape
    u = jnp.zeros((kh, 2 * c, 2 * co), w.dtype)
    u = u.at[:, 0:c, 0:co].set(w[:, 1])
    u = u.at[:, c:2 * c, 0:co].set(w[:, 2])
    u = u.at[:, 0:c, co:2 * co].set(w[:, 0])
    u = u.at[:, c:2 * c, co:2 * co].set(w[:, 1])
    s = jnp.zeros((kh, 2 * c, 2 * co), w.dtype)
    s = s.at[:, 0:c, co:2 * co].set(w[:, 2])
    s = s.at[:, c:2 * c, 0:co].set(w[:, 0])
    return jnp.concatenate([u, s], axis=1)


def pack_p2n_proj(w: jnp.ndarray) -> jnp.ndarray:
    """w: (1, 1, 64, 128) -> (128, 256): pair lanes (p, ci) to plane
    cols (plane = p, co)."""
    ci, co = w.shape[2], w.shape[3]
    m = jnp.zeros((2 * ci, 2 * co), w.dtype)
    m = m.at[0:ci, 0:co].set(w[0, 0])
    m = m.at[ci:2 * ci, co:2 * co].set(w[0, 0])
    return m


def _interleave_matrix(W: int) -> np.ndarray:
    """(W, W) 0/1 matrix: out row 2g+p reads row g + p*W/2 of the
    sublane-stacked [E; O] plane block."""
    wg = W // 2
    m = np.zeros((W, W), np.float32)
    for g in range(wg):
        m[2 * g, g] = 1.0
        m[2 * g + 1, wg + g] = 1.0
    return m


def _kernel(x_hbm, w1_ref, w2_ref, wp_ref, pm_ref, s_ref, t_ref, out_ref,
            in_buf, ring, sem, *, H: int, tile_h: int):
    f = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    th = tile_h
    n_tiles = H // th
    Wg = in_buf.shape[1]
    r0 = t * th

    @pl.when(t == 0)
    def _load():
        # one zero halo row on top, TWO on the bottom: the throwaway
        # mid row H computed by the last tile reads buffer row H + 2.
        in_buf[:1] = jnp.zeros_like(in_buf[:1])
        in_buf[H + 1:] = jnp.zeros_like(in_buf[H + 1:])
        copy = pltpu.make_async_copy(
            x_hbm.at[f], in_buf.at[pl.ds(1, H)], sem)
        copy.start()
        copy.wait()

    # ---- ring shift: rows [0, 2) take the previous step's tail (ring
    # row j holds mid row r0 - 1 + j).
    @pl.when(t > 0)
    def _shift():
        ring[0:2] = ring[th:th + 2]

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    def conv1_rows(start, n):
        """conv1 for mid rows [start, start+n) -> (n, Wg, 256) planes."""
        acc = jnp.zeros((n, Wg, 256), f32)
        lane = None
        for dy in range(3):
            slab = in_buf[pl.ds(start + dy, n)]   # buffer row = mid row+dy
            if lane is None:
                lane = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 2)
            sel = jnp.where(lane < 64, _shift_w(slab, 1),
                            _shift_w(slab, -1))
            acc = acc + dot(slab, w1_ref[dy, :128])
            acc = acc + dot(sel, w1_ref[dy, 128:])
        y = acc * s_ref[0][None, None, :] + t_ref[0][None, None, :]
        return jnp.maximum(y, 0.0)

    # ---- conv1: th new mid rows [r0+1, r0+th+1), each computed ONCE.
    ring[2:th + 2] = conv1_rows(r0 + 1, th).astype(ring.dtype)

    @pl.when(t == 0)
    def _seed():
        # mid row -1 is conv2's zero top padding; mid row 0 is real.
        ring[0:1] = jnp.zeros_like(ring[0:1])
        ring[1:2] = conv1_rows(0, 1).astype(ring.dtype)

    @pl.when(t == n_tiles - 1)
    def _bottom():
        # absolute mid row H is below the image: conv2 zero padding.
        ring[th + 1:th + 2] = jnp.zeros_like(ring[th + 1:th + 2])

    # ---- conv2 + projection skip -> (th, Wg, 256) plane output.
    acc = jnp.zeros((th, Wg, 256), f32)
    lane2 = None
    for dy in range(3):
        slab = ring[pl.ds(dy, th)]
        if lane2 is None:
            lane2 = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 2)
        sel = jnp.where(lane2 < 128, _shift_w(slab, 1),
                        _shift_w(slab, -1))
        acc = acc + dot(slab, w2_ref[dy, :256])
        acc = acc + dot(sel, w2_ref[dy, 256:])
    y = acc * s_ref[1][None, None, :] + t_ref[1][None, None, :]
    proj = dot(in_buf[pl.ds(r0 + 1, th)], wp_ref[...])
    y = y + proj * s_ref[2][None, None, :] + t_ref[2][None, None, :]
    yb = y.astype(out_ref.dtype)

    # ---- plane interleave on the MXU: out row 2g+p <- plane p row g.
    pm = pm_ref[...]
    for r in range(th):
        eo = jnp.concatenate([yb[r, :, 0:128], yb[r, :, 128:256]], axis=0)
        out_ref[0, r] = jax.lax.dot_general(
            pm, eo, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32).astype(out_ref.dtype)


def _tile_h(H: int, Wg: int, itemsize: int = 2):
    """Largest row tile whose static working set stays within ~10 MB
    (the scoped-VMEM stack runs a few MB above the static estimate)."""
    weights = (3 * 256 * 256 + 3 * 512 * 256 + 128 * 256
               + (2 * Wg) * (2 * Wg)) * itemsize
    in_bytes = (H + 3) * Wg * 128 * itemsize
    for t in (24, 22, 20, 16, 15, 12, 11, 10, 8, 6, 5, 4):
        if H % t:
            continue
        ring = (t + 2) * Wg * 256 * itemsize
        out = 2 * t * (2 * Wg) * 128 * itemsize       # double-buffered
        accs = 2 * t * Wg * 256 * 4                   # f32 conv1+conv2
        if in_bytes + ring + out + accs + weights <= 10 * 1024 * 1024:
            return t
    return None


def expand_block(x: jnp.ndarray, w1, s1, t1, w2, s2, t2, wp, sp, tp,
                 interpret: bool = False) -> jnp.ndarray:
    """x: (N, H, W, 64); w1: (3, 3, 64, 128); w2: (3, 3, 128, 128);
    wp: (1, 1, 64, 128); s*/t*: (128,) folded BN. Returns
    (N, H, W, 128)."""
    N, H, W, C = x.shape
    Wg = W // 2
    dt = x.dtype
    th = _tile_h(H, Wg, jnp.dtype(dt).itemsize)

    xq = x.reshape(N, H, Wg, 128)
    w1p = pack_p2n_conv1(w1.astype(dt))
    w2p = pack_p2n_conv2(w2.astype(dt))
    wpp = pack_p2n_proj(wp.astype(dt))
    pm = jnp.asarray(_interleave_matrix(W), dtype=dt)
    # output lanes are (plane, co): duplicate the folded BN vectors
    s = jnp.stack([jnp.concatenate([a, a]) for a in (s1, s2, sp)])
    t = jnp.stack([jnp.concatenate([a, a]) for a in (t1, t2, tp)])

    kernel = functools.partial(_kernel, H=H, tile_h=th)
    return pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, W, 128), lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, 128), dt),
        scratch_shapes=[
            pltpu.VMEM((H + 3, Wg, 128), dt),
            pltpu.VMEM((th + 2, Wg, 256), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xq, w1p, w2p, wpp, pm, s.astype(jnp.float32),
      t.astype(jnp.float32))


def use_p2n() -> bool:
    """MAGNET_TPU_PALLAS_P2N=0 forces the XLA path (A/B switch)."""
    import os
    return os.environ.get("MAGNET_TPU_PALLAS_P2N", "1") == "1"


def supported(x_shape, itemsize: int = 2) -> bool:
    """x_shape: layer2 output (N, H, W, 64); W/2 must be a multiple of
    8 (sublane-aligned pair groups) and H must admit a row tile."""
    N, H, W, C = x_shape
    if C != 64 or W % 16:
        return False
    return _tile_h(H, W // 2, itemsize) is not None

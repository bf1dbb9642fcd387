"""Pallas TPU kernel: fused PSM-Net residual stage (chain of BasicBlocks).

Replaces the XLA op-by-op execution of PSM-Net's stride-1 residual blocks
(reference models/submodules/F_psmnet.py:17-34) on the inference path.

Why: a BasicBlock is conv3x3-BN-ReLU-conv3x3-BN-add on a (120, 160, 64/128)
feature map. Run op-by-op, every conv round-trips the feature map through
HBM and XLA inserts layout copies between blocks (~6.8 ms of convolution +
~2 ms of data formatting per MaGNet frame across the 22 blocks). The whole
feature map is only 2.5-4.9 MB in bf16 — it fits in VMEM. This kernel keeps
it resident across an entire chain of blocks: grid = (frame, conv), two
ping-pong VMEM buffers, one HBM read per frame and one write at the last
conv. Eval-mode BN is folded to a per-channel scale/shift; ReLU and the
residual add are fused into the conv epilogue.

MXU mapping:
  * C=128 stages (layer3/layer4): natural (H, W, 128) layout. Per tap row
    dy, an (tile_h, W, 3*128) im2col slab — built from two cheap sublane
    shifts — contracts with a (3*128, 128) weight matrix on the MXU.
    Dilation d shifts by d instead of 1 (layer4, d=2). K and N are exact
    MXU tiles: no padding waste.
  * C=64 stage (layer2): pixel-PAIR packing. N=64 would idle half the MXU,
    so two horizontally adjacent output pixels share each matmul row:
    lanes = (pixel parity, channel), the buffer is (H, W/2, 128), and the
    per-dy weight matrix is ((kw+1)*64, 2*64) holding both pixels' taps
    (entry [(dx6, ci), (p, co)] = w[dy, dx6-p, ci, co], zero outside the
    3-tap window). 75% of the MXU work is useful vs <=50% unpaired.
  * C=32 stages (stem convs 2-3 and layer1, at 240x320): pixel-QUAD
    packing — four adjacent pixels in lanes, buffer (H, W/4, 128), two
    dots per dy (see pack_conv_quad): 62.5% useful MXU work vs <=25%
    unpacked. Stem chains run with residual=False (conv-BN-ReLU each).

Weights/BN are packed once per trace by the `pack_*` helpers (pure jnp,
negligible). Training and non-TPU backends keep the reference XLA path
(this kernel has no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAD = 2          # top/bottom zero rows in the resident buffers (>= max d)


def _tile_h(H: int):
    """Largest row tile <= 24 that divides H (big M per MXU dispatch,
    few loop iterations). None if nothing reasonable divides H."""
    for t in (24, 22, 20, 16, 15, 12, 11, 10, 8, 6, 5, 4):
        if H % t == 0:
            return t
    return None


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Eval-mode BN as y = x * s + t (all (C,) f32)."""
    s = scale / jnp.sqrt(var + eps)
    return s, bias - mean * s


def pack_conv_natural(w: jnp.ndarray) -> jnp.ndarray:
    """w: (3, 3, C, C) HWIO -> (3, 3*C, C) per-dy contraction matrix with
    lanes ordered (dx, ci)."""
    kh, kw, ci, co = w.shape
    return w.reshape(kh, kw * ci, co)


# Row-group order of the paired contraction: group g holds the taps of
# original column 2*pg-1+dx6 with dx6 = _PAIR_DX6[g]. The order is chosen
# so the kernel's im2col needs ONLY lane-half selects (no lane rotates,
# which Mosaic cannot do on bf16): [pg:p0 | pg-1:p1 | pg+1:p0 | pg:p1].
_PAIR_DX6 = (1, 0, 3, 2)


def pack_conv_quad(w: jnp.ndarray) -> jnp.ndarray:
    """w: (3, 3, 32, 32) -> (3, 2*128, 128) pixel-QUAD matrices (C=32:
    four horizontally adjacent pixels share the 128 lanes, lane =
    (q, ci) q-major). Two contraction groups per dy:
      group A (unshifted packed slab): A[(q,ci),(p,co)] = w[dy,q-p+1,ci,co]
        for 0 <= q-p+1 < 3 — all in-group taps (10 of 12).
      group B (lane-selected slab: q=0 lanes hold group pg+1, q=3 lanes
        group pg-1): B[(0,ci),(3,co)] = w[dy,2]; B[(3,ci),(0,co)] =
        w[dy,0] — the two cross-group taps.
    62.5% of the 2-dot MXU work is useful vs <=25% lane use unpacked."""
    kh, kw, ci, co = w.shape
    a = jnp.zeros((kh, 4 * ci, 4 * co), w.dtype)
    for q in range(4):
        for p in range(4):
            dx = q - p + 1
            if 0 <= dx < kw:
                a = a.at[:, q * ci:(q + 1) * ci,
                         p * co:(p + 1) * co].set(w[:, dx])
    b = jnp.zeros((kh, 4 * ci, 4 * co), w.dtype)
    b = b.at[:, 0:ci, 3 * co:4 * co].set(w[:, 2])
    b = b.at[:, 3 * ci:4 * ci, 0:co].set(w[:, 0])
    return jnp.concatenate([a, b], axis=1)


def pack_conv_paired(w: jnp.ndarray) -> jnp.ndarray:
    """w: (3, 3, C, C) -> (3, (kw+1)*C, 2*C) pixel-pair matrix: output lane
    (p, co) for original column 2*pg+p; contraction row group g for
    original column 2*pg-1+_PAIR_DX6[g]; entry = w[dy, dx6-p, ci, co]
    where defined, else zero."""
    kh, kw, ci, co = w.shape
    out = jnp.zeros((kh, (kw + 1) * ci, 2 * co), w.dtype)
    for g, dx6 in enumerate(_PAIR_DX6):
        for p in range(2):
            dx = dx6 - p
            if 0 <= dx < kw:
                out = out.at[:, g * ci:(g + 1) * ci,
                             p * co:(p + 1) * co].set(w[:, dx])
    return out


def _shift_w(slab, d: int):
    """Shift along the W (sublane) axis: position w holds source w+d,
    zero outside [0, W). Static slices + concat — Mosaic lowers these as
    static sublane shifts (bf16-safe; pltpu.roll is not)."""
    if d == 0:
        return slab
    if d > 0:
        return jnp.concatenate(
            [slab[:, d:], jnp.zeros_like(slab[:, :d])], axis=1)
    return jnp.concatenate(
        [jnp.zeros_like(slab[:, :(-d)]), slab[:, :slab.shape[1] + d]],
        axis=1)


def _kernel(x_hbm, w_ref, s_ref, t_ref, out_hbm, a_buf, b_buf, sem, *,
            n_convs: int, H: int, d: int, mode: str, residual: bool,
            tile_h: int):
    """Grid (frame, conv). a_buf holds the current block's input (+ the
    running residual); b_buf holds the intermediate after conv1. The
    feature map moves HBM->VMEM once per frame and back once — x/out stay
    in HBM (pl.ANY) because pipelined full-map blocks would not leave room
    for the two resident buffers."""
    f = pl.program_id(0)
    c = pl.program_id(1)
    f32 = jnp.float32
    n_tiles = H // tile_h
    Wb, Cb = a_buf.shape[1], a_buf.shape[2]
    half = Cb // 2

    @pl.when(c == 0)
    def _init():
        zero_rows = jnp.zeros((_PAD, Wb, Cb), a_buf.dtype)
        a_buf[:_PAD] = zero_rows
        a_buf[H + _PAD:] = zero_rows
        b_buf[:_PAD] = zero_rows
        b_buf[H + _PAD:] = zero_rows
        copy = pltpu.make_async_copy(
            x_hbm.at[f], a_buf.at[pl.ds(_PAD, H)], sem)
        copy.start()
        copy.wait()

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    def make_body(src_buf, is_conv1):
        """Branch-free conv body specialized (python-level) for the
        conv1 (A->relu->B) vs conv2 (B->(+A)->A) roles, so no lax.cond
        sits inside the hot loop."""
        def body(t, _):
            r0 = t * tile_h + _PAD
            acc = jnp.zeros((tile_h, Wb, Cb), f32)
            for dy in range(3):
                slab = src_buf[pl.ds(r0 + (dy - 1) * d, tile_h)]
                if mode == "paired":
                    left = _shift_w(slab, -1)
                    right = _shift_w(slab, 1)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, slab.shape, 2)
                    sel = lane < half
                    lo = jnp.where(sel, slab, left)   # [pg:p0 | pg-1:p1]
                    hi = jnp.where(sel, right, slab)  # [pg+1:p0 | pg:p1]
                    # row-group order matches _PAIR_DX6 in pack_conv_paired
                    acc = acc + dot(lo, w_ref[0, dy, :Cb])
                    acc = acc + dot(hi, w_ref[0, dy, Cb:])
                elif mode == "quad":
                    # group A: unshifted slab, in-group taps; group B:
                    # q=0 lanes take the right (pg+1) slab (feeds p=3),
                    # q=3 lanes the left (pg-1) slab (feeds p=0) — see
                    # pack_conv_quad. q=1,2 lanes multiply zero rows.
                    left = _shift_w(slab, -1)
                    right = _shift_w(slab, 1)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, slab.shape, 2)
                    s_b = jnp.where(lane < Cb // 4, right, left)
                    acc = acc + dot(slab, w_ref[0, dy, :Cb])
                    acc = acc + dot(s_b, w_ref[0, dy, Cb:])
                else:
                    acc = acc + dot(_shift_w(slab, -d), w_ref[0, dy, :Cb])
                    acc = acc + dot(slab, w_ref[0, dy, Cb:2 * Cb])
                    acc = acc + dot(_shift_w(slab, d), w_ref[0, dy, 2 * Cb:])

            s = s_ref[pl.ds(c, 1)]                       # (1, Cb) f32
            tt = t_ref[pl.ds(c, 1)]
            y = acc * s[:, None, :] + tt[:, None, :]
            if is_conv1:
                b_buf[pl.ds(r0, tile_h)] = jnp.maximum(y, 0.0).astype(
                    b_buf.dtype)
            elif residual:
                res = a_buf[pl.ds(r0, tile_h)]
                a_buf[pl.ds(r0, tile_h)] = (y + res.astype(f32)).astype(
                    a_buf.dtype)
            else:
                # stem chain (conv-BN-ReLU each, no skip): even convs
                # land here with a plain ReLU write-back.
                a_buf[pl.ds(r0, tile_h)] = jnp.maximum(y, 0.0).astype(
                    a_buf.dtype)
            return ()
        return body

    @pl.when(c % 2 == 0)
    def _conv1():
        jax.lax.fori_loop(0, n_tiles, make_body(a_buf, True), ())

    @pl.when(c % 2 == 1)
    def _conv2():
        jax.lax.fori_loop(0, n_tiles, make_body(b_buf, False), ())

    @pl.when(c == n_convs - 1)
    def _writeback():
        copy = pltpu.make_async_copy(
            a_buf.at[pl.ds(_PAD, H)], out_hbm.at[f], sem)
        copy.start()
        copy.wait()


def fused_residual_stage(x: jnp.ndarray, weights: jnp.ndarray,
                         scales: jnp.ndarray, shifts: jnp.ndarray,
                         dilation: int, mode: str,
                         residual: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """x: (N, H, W, C) NHWC feature map; weights: (n_convs, 3, K, Cout)
    packed per-dy matrices (pack_conv_quad for C=32, pack_conv_paired for
    C=64, pack_conv_natural for C=128); scales/shifts: (n_convs, Cout)
    f32 folded BN; one static dilation for the whole chain. mode:
    'natural' | 'paired' | 'quad'. residual=False runs the chain as
    stem-style conv-BN-ReLU convs (no skip; n_convs must stay even).
    Returns (N, H, W, C)."""
    N, H, W, C = x.shape
    n_convs = weights.shape[0]
    pack_px = {"natural": 1, "paired": 2, "quad": 4}[mode]
    if pack_px > 1:
        xb = x.reshape(N, H, W // pack_px, pack_px * C)
        # output lanes are (pixel index, channel): duplicate the folded
        # BN vectors across the packed pixels
        scales = jnp.concatenate([scales] * pack_px, axis=-1)
        shifts = jnp.concatenate([shifts] * pack_px, axis=-1)
    else:
        xb = x
    Wb, Cb = xb.shape[2], xb.shape[3]

    kernel = functools.partial(_kernel, n_convs=n_convs, H=H,
                               d=int(dilation), mode=mode,
                               residual=residual, tile_h=_tile_h(H))
    out = pl.pallas_call(
        kernel,
        grid=(N, n_convs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # feature map, HBM
            pl.BlockSpec((1,) + weights.shape[1:],
                         lambda f, c: (c, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, H, Wb, Cb), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((H + 2 * _PAD, Wb, Cb), x.dtype),
            pltpu.VMEM((H + 2 * _PAD, Wb, Cb), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xb, weights, scales.astype(jnp.float32), shifts.astype(jnp.float32))
    if pack_px > 1:
        out = out.reshape(N, H, W, C)
    return out


def mode_for(C: int):
    """Packing mode for a channel count, or None if unsupported."""
    return {32: "quad", 64: "paired", 128: "natural"}.get(C)


def supported(x_shape, n_blocks: int, dilation: int,
              itemsize: int = 2) -> bool:
    N, H, W, C = x_shape
    if _tile_h(H) is None or n_blocks < 1 or dilation > _PAD:
        return False
    mode = mode_for(C)
    if mode is None:
        return False
    pack_px = {"natural": 1, "paired": 2, "quad": 4}[mode]
    if W % pack_px:
        return False
    if pack_px > 1 and dilation != 1:
        # packed-pixel im2col shifts whole groups: horizontal taps are
        # hard-wired to distance 1
        return False
    Wb, Cb = W // pack_px, 128
    # 2 resident buffers + im2col transients (one live (tile, Wb, 3Cb)
    # slab set + the f32 acc) + double-buffered weight blocks must fit
    # VMEM. Calibrated against a real v5e compile: ScanNet natural
    # (5,120,160,128) at tile 24 -> ~15.7 MB estimate, compiles and runs.
    bufs = 2 * (H + 2 * _PAD) * Wb * Cb * itemsize
    th = _tile_h(H)
    trans = th * Wb * 3 * Cb * itemsize + th * Wb * Cb * 4
    w_rows = {"quad": 8 * C, "paired": 4 * C, "natural": 3 * C}[mode]
    wblk = 2 * 3 * w_rows * Cb * itemsize
    return bufs + trans + wblk <= 16 * 1024 * 1024

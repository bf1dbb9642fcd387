"""Pallas TPU kernel: fused prediction-head chains over the decoder feature.

The three heads that consume the D-Net decoder feature x_d3 — the depth
head (conv3x3 -> ReLU -> conv1x1 -> ReLU -> conv1x1, D_dense_depth.py:
148-152), MAGNET's 4-conv mask head (MAGNET.py:112-117) and G-Net's
feature branch of its first layer (the iteration-invariant half of
MAGNET.py:51) — are each a single 3x3 conv followed by pointwise convs.
Op-by-op XLA runs them as separate conv fusions at batch-1/thin-channel
shapes with relayouts between (~1.5 ms/frame total); fused, each head is
one pass over x_d3: DMA a (tile+2)-row window, one 3x3 contraction into
an f32 accumulator, then the 1x1 chain entirely in VMEM.

Because every head has exactly ONE spatial conv (the first), overlapping
windows (tile+2 rows in, tile rows out) incur no recompute at all — no
ring buffering needed. Both kernel boundaries are Pallas custom calls on
the ScanNet path (x_d3 is produced by the fused up3 kernel), so XLA
forces no relayout of big producers/consumers around it.

Engaged at eval on TPU (golden-tested in interpret mode elsewhere);
training and non-TPU backends keep the XLA modules (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w


def use_pallas_heads() -> bool:
    import os
    env = os.environ.get("MAGNET_TPU_PALLAS_HEADS", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


def _tile(H: int) -> int:
    # >= 2 tiles so the top/bottom zero-edge re-shifts are disjoint
    for t in (24, 20, 16, 12, 10, 8, 6, 4):
        if H % t == 0 and H // t >= 2:
            return t
    return None


def supported(x_shape) -> bool:
    N, H, W, C = x_shape
    return C % 128 == 0 and W >= 2 and _tile(H) is not None


def _kernel(x_hbm, *refs, n_convs: int, relus, H: int, tile_h: int):
    w_refs = refs[:n_convs]
    b_refs = refs[n_convs:2 * n_convs]
    out_ref = refs[2 * n_convs]
    x_s = refs[2 * n_convs + 1]
    sem = refs[2 * n_convs + 2]

    f = pl.program_id(0)
    t = pl.program_id(1)
    f32 = jnp.float32
    th = tile_h
    n_tiles = H // th
    W = x_s.shape[1]
    c0 = x_s.shape[-1]
    r0 = t * th

    # window rows [r0-1, r0+th+1), start clamped in-frame; edge tiles
    # re-shift so the out-of-frame row reads as zero.
    start = jnp.clip(r0 - 1, 0, H - (th + 2))
    c = pltpu.make_async_copy(
        x_hbm.at[f, pl.ds(start, th + 2)], x_s, sem)
    c.start()
    c.wait()

    @pl.when(t == 0)
    def _top():
        vals = x_s[...]
        x_s[...] = jnp.concatenate(
            [jnp.zeros_like(vals[:1]), vals[:-1]], axis=0)

    @pl.when(t == n_tiles - 1)
    def _bottom():
        vals = x_s[...]
        x_s[...] = jnp.concatenate(
            [vals[1:], jnp.zeros_like(vals[:1])], axis=0)

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    # conv0: 3x3 over the window -> exactly th output rows, no recompute.
    c1 = w_refs[0].shape[-1]
    acc = jnp.zeros((th, W, c1), f32)
    for dy in range(3):
        slab = x_s[dy:dy + th]
        for dx in range(3):
            for ck in range(c0 // 128):
                sub = slab[:, :, ck * 128:(ck + 1) * 128]
                acc = acc + dot(_shift_w(sub, dx - 1),
                                w_refs[0][dy, dx, ck * 128:(ck + 1) * 128])
    y = acc + b_refs[0][0][None, None, :]
    if relus[0]:
        y = jnp.maximum(y, 0.0)

    # pointwise chain, entirely in VMEM.
    for i in range(1, n_convs):
        w = w_refs[i][0, 0]
        y = dot(y.astype(w.dtype), w) + b_refs[i][0][None, None, :]
        if relus[i]:
            y = jnp.maximum(y, 0.0)

    out_ref[0] = y.astype(out_ref.dtype)


def head_chain_pallas(x: jnp.ndarray, convs, interpret: bool = False
                      ) -> jnp.ndarray:
    """x: (N, H, W, C0), C0 a multiple of 128. convs: list of
    (kernel (kh, kw, ci, co), bias (co,) or None, relu: bool); the first
    conv is 3x3 (padding 1), the rest 1x1. Returns (N, H, W, co_last)."""
    N, H, W, C0 = x.shape
    th = _tile(H)
    dt = x.dtype
    f32 = jnp.float32

    n = len(convs)
    relus = tuple(bool(r) for (_, _, r) in convs)
    ws = [jnp.asarray(k, dt) for (k, _, _) in convs]
    bs = [jnp.zeros((1, k.shape[-1]), f32) if b is None
          else jnp.asarray(b, f32).reshape(1, -1) for (k, b, _) in convs]
    c_out = ws[-1].shape[-1]

    kernel = functools.partial(_kernel, n_convs=n, relus=relus, H=H,
                               tile_h=th)
    return pl.pallas_call(
        kernel,
        grid=(N, H // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n),
        out_specs=pl.BlockSpec((1, th, W, c_out), lambda f, t: (f, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, c_out), dt),
        scratch_shapes=[
            pltpu.VMEM((th + 2, W, C0), dt),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x, *ws, *bs)

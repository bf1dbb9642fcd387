"""Pallas TPU kernel: fused RAFT-style convex upsampling (EXPERIMENTAL).

Fuses the whole learned-upsampling chain (reference models/MAGNET.py:15-27)
into one VMEM pass per row-block: softmax over the 9 neighborhood weights,
the 3x3 zero-padded neighborhood combine, and the k x k pixel-shuffle to
full resolution.

STATUS: numerically verified in interpret mode (tests/test_pallas.py) but
NOT yet in the production path — this jax version's Mosaic lowers the
lane-dim reshapes (mask (..., 9*k*k) -> (..., 9, k*k) and the final
pixel-shuffle) through lax.gather, which Mosaic only supports for
single-tile operands. The production path keeps the XLA implementation
(ops/upsample.py), which profiles at ~1 ms/frame. A channel-planar kernel
layout (lane slices instead of lane reshapes, planar (k, k, H, W) output
with an XLA depth-to-space epilogue) is the known fix; left for a later
round since the ceiling here is small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8       # coarse rows per grid step


def _kernel(depth_ref, mask_ref, out_ref, *, k: int, H: int, W: int,
            C: int):
    """depth_ref: (1, H, W, C) full coarse map; mask_ref:
    (1, _ROWS, W, 9*k*k) row block; out_ref: (1, _ROWS*k, W*k, C)."""
    h0 = pl.program_id(1) * _ROWS

    m = mask_ref[0].astype(jnp.float32).reshape(_ROWS, W, 9, k * k)
    m = m - jnp.max(m, axis=2, keepdims=True)
    m = jnp.exp(m)
    m = m / jnp.sum(m, axis=2, keepdims=True)               # softmax over 9

    zero_row = jnp.zeros((1, W, C), jnp.float32)
    acc = jnp.zeros((_ROWS, W, k * k, C), jnp.float32)
    for j in range(9):
        dy, dx = j // 3 - 1, j % 3 - 1
        # Desired rows s..s+_ROWS-1 of the zero-padded map, s = h0+dy in
        # [-1, H-_ROWS+1]. Read at clamped start rs; delta = s - rs is in
        # {-1, 0, +1} and selects a one-row shift whose zero fill IS the
        # zero padding.
        s = h0 + dy
        rs = jnp.clip(s, 0, H - _ROWS)
        delta = s - rs
        read = depth_ref[0, pl.ds(rs, _ROWS), :, :].astype(jnp.float32)
        down = jnp.concatenate([zero_row, read[:-1]], axis=0)
        up = jnp.concatenate([read[1:], zero_row], axis=0)
        rows = ((delta == -1).astype(jnp.float32) * down
                + (delta == 1).astype(jnp.float32) * up
                + (delta == 0).astype(jnp.float32) * read)
        # Column shift (static) with zero fill.
        if dx == -1:
            cols = jnp.concatenate(
                [jnp.zeros((_ROWS, 1, C), jnp.float32), rows[:, :-1, :]],
                axis=1)
        elif dx == 1:
            cols = jnp.concatenate(
                [rows[:, 1:, :], jnp.zeros((_ROWS, 1, C), jnp.float32)],
                axis=1)
        else:
            cols = rows
        acc = acc + m[:, :, j, :, None] * cols[:, :, None, :]

    # (ROWS, W, k, k, C) -> (ROWS, k, W, k, C) -> (ROWS*k, W*k, C)
    acc = acc.reshape(_ROWS, W, k, k, C)
    acc = jnp.transpose(acc, (0, 2, 1, 3, 4))
    out_ref[0] = acc.reshape(_ROWS * k, W * k, C).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def upsample_via_mask_pallas(depth: jnp.ndarray, up_mask: jnp.ndarray,
                             k: int, interpret: bool = False) -> jnp.ndarray:
    """depth: (B, H, W, C); up_mask: (B, H, W, 9*k*k) -> (B, kH, kW, C)."""
    B, H, W, C = depth.shape
    assert H % _ROWS == 0, f"H={H} must be a multiple of {_ROWS}"
    grid = (B, H // _ROWS)
    kern = functools.partial(_kernel, k=k, H=H, W=W, C=C)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, W, 9 * k * k),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _ROWS * k, W * k, C),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * k, W * k, C), depth.dtype),
        interpret=interpret,
    )(depth, up_mask)

"""RAFT-style learned convex upsampling (NHWC).

Equivalent of the reference's ``upsample_depth_via_mask``
(models/MAGNET.py:15-27, duplicated at D_dense_depth.py:86-100): each
full-resolution output pixel is a softmax-weighted convex combination of the
3x3 coarse neighborhood around its parent coarse pixel.

Mask channel layout matches the torch ``view(N, 1, 9, k, k, H, W)``
convention: channel index ``c = j*(k*k) + ki*k + kj`` where ``j = ky*3 + kx``
indexes the 3x3 neighborhood row-major — required for checkpoint-weight
parity of the mask head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from magnet_tpu.ops.resample import resize_bilinear_align_corners


def _neighborhood_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 9, C): zero-padded 3x3 neighborhoods,
    j = ky*3 + kx row-major (torch F.unfold ordering)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nb = [xp[:, ky:ky + H, kx:kx + W, :] for ky in range(3) for kx in range(3)]
    return jnp.stack(nb, axis=3)


def upsample_via_mask(depth: jnp.ndarray, up_mask: jnp.ndarray,
                      k: int) -> jnp.ndarray:
    """depth: (B, H, W, C); up_mask: (B, H, W, 9*k*k). Returns (B, kH, kW, C)."""
    B, H, W, C = depth.shape
    mask = up_mask.reshape(B, H, W, 9, k, k).astype(jnp.float32)
    mask = jax.nn.softmax(mask, axis=3)                   # softmax over 9

    nb = _neighborhood_3x3(depth.astype(jnp.float32))     # (B, H, W, 9, C)
    # out[b,h,w,ki,kj,c] = sum_j mask[b,h,w,j,ki,kj] * nb[b,h,w,j,c]
    out = jnp.einsum("bhwjkl,bhwjc->bhwklc", mask, nb)
    out = out.transpose(0, 1, 3, 2, 4, 5)                 # (B, H, k, W, k, C)
    return out.reshape(B, H * k, W * k, C).astype(depth.dtype)


def upsample_bilinear(depth: jnp.ndarray, up_mask, k: int) -> jnp.ndarray:
    """Bilinear fallback (D_dense_depth.py:81-82, align_corners=True)."""
    B, H, W, C = depth.shape
    return resize_bilinear_align_corners(depth, H * k, W * k)

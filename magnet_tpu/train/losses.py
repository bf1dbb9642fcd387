"""Training losses (reference utils/losses.py), jit-friendly.

The reference indexes valid pixels with boolean masks
(losses.py:15-21,36-48) which would create dynamic shapes under jit; here
masked means are computed as weighted sums — identical values, static
shapes.

Conventions: predictions NHWC with channel pair on the last axis —
(mu, var) for D-Net, (mu, sigma) for MaGNet.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

_VAR_FLOOR = 1e-10


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def gaussian_nll(mu: jnp.ndarray, var: jnp.ndarray,
                 gt: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel Gaussian NLL: (mu-gt)^2/(2 var) + log(var)/2, var floored
    at 1e-10 (losses.py:19-21)."""
    var = jnp.maximum(var.astype(jnp.float32), _VAR_FLOOR)
    mu = mu.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    return jnp.square(mu - gt) / (2.0 * var) + 0.5 * jnp.log(var)


def dnet_loss(pred: jnp.ndarray, gt_depth: jnp.ndarray,
              mask: jnp.ndarray) -> jnp.ndarray:
    """D-Net loss: masked mean NLL with (mu, var) channels
    (losses.py:13-22). pred: (B, H, W, 2); gt_depth, mask: (B, H, W)."""
    nll = gaussian_nll(pred[..., 0], pred[..., 1], gt_depth)
    return _masked_mean(nll, mask)


def magnet_loss(pred_list: Sequence[jnp.ndarray], gt_depth: jnp.ndarray,
                mask: jnp.ndarray, gamma: float = 0.8) -> jnp.ndarray:
    """Sequence loss over refinement iterations, weight gamma^(N-i-1),
    (mu, sigma) channels with var = sigma^2 (losses.py:34-50)."""
    n = len(pred_list)
    loss = 0.0
    for i, pred in enumerate(pred_list):
        w = gamma ** (n - i - 1)
        sigma = pred[..., 1].astype(jnp.float32)
        nll = gaussian_nll(pred[..., 0], jnp.square(sigma), gt_depth)
        loss = loss + w * _masked_mean(nll, mask)
    return loss


def fnet_l1_loss(pred_depth: jnp.ndarray, gt_depth: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """L1 between soft-argmax depth and (nearest-downsampled) GT at dpv
    resolution (train_FNet.py:100-106)."""
    l1 = jnp.abs(pred_depth.astype(jnp.float32) - gt_depth.astype(
        jnp.float32))
    return _masked_mean(l1, mask)


def soft_argmax_depth(cost_volume: jnp.ndarray,
                      d_center: jnp.ndarray) -> jnp.ndarray:
    """Expected depth under the softmaxed sweep volume
    (train_FNet.py:96): (B, H, W, D) x (D,) -> (B, H, W)."""
    return jnp.sum(cost_volume * d_center[None, None, None, :], axis=-1)

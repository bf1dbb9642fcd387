"""D-Net: single-view Gaussian depth model (reference models/DNET.py).

Wraps DenseDepth with the output activation selected by ``output_type``:
  'R' — raw regression output;
  'G' — Gaussian: split (mu, v), var = elu(v) + 1 + 1e-10 (DNET.py:56-60).
The MaGNet-internal variant returns (mu, stdev=sqrt(var)) at coarse
resolution plus the 256-ch decoder feature (DNET.py:62-67).

All tensors NHWC; the channel pair is (mu, var) or (mu, sigma) on the last
axis.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.densedepth import DenseDepth


def activation_gaussian(out: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) raw -> (mu, var) with var = elu(v) + 1 + 1e-10."""
    mu = out[..., 0:1]
    v = out[..., 1:2].astype(jnp.float32)
    var = jax.nn.elu(v) + 1.0 + 1e-10
    return jnp.concatenate([mu, var.astype(out.dtype)], axis=-1)


def activation_gaussian_stdev(out: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) raw -> (mu, sigma) with sigma = sqrt(elu(v) + 1 + 1e-10)."""
    mu = out[..., 0:1]
    v = out[..., 1:2].astype(jnp.float32)
    sigma = jnp.sqrt(jax.nn.elu(v) + 1.0 + 1e-10)
    return jnp.concatenate([mu, sigma.astype(out.dtype)], axis=-1)


class DNet(nn.Module):
    """Standalone D-Net (full-resolution output)."""
    output_dim: int = 2
    output_type: str = "G"
    downsample_ratio: int = 4
    use_bn: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = DenseDepth(num_classes=self.output_dim,
                         downsample_ratio=self.downsample_ratio,
                         learned_upsampling=True,
                         use_bn=self.use_bn,
                         as_dnet=True, remat=self.remat,
                         name="d_net")(img, train)
        if self.output_type == "G":
            return activation_gaussian(out)
        return out


class DNetCoarse(nn.Module):
    """MaGNet-internal D-Net: coarse (mu, sigma) + decoder feature."""
    output_dim: int = 2
    downsample_ratio: int = 4
    use_bn: bool = True

    @nn.compact
    def __call__(self, img: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        depth, feat = DenseDepth(num_classes=self.output_dim,
                                 downsample_ratio=self.downsample_ratio,
                                 learned_upsampling=True,
                                 use_bn=self.use_bn,
                                 as_dnet=False, name="d_net")(img, train)
        return activation_gaussian_stdev(depth), feat

"""G-Net: thin cost-volume -> residual Gaussian update (models/MAGNET.py:47-70).

A 4-layer CNN maps concat(cost volume, D-Net decoder feature) to a residual
update of the depth Gaussian in sigma-normalized space:
    mu_new    = mu_0 + mu_1 * sigma_0
    sigma_new = (elu(sigma_1) + 1 + 1e-10) * sigma_0
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.layers import Conv, relu


class GNet(nn.Module):
    hidden: int = 128
    out_ch: int = 2

    @nn.compact
    def __call__(self, cost_volume: jnp.ndarray,
                 ref_gaussian: jnp.ndarray) -> jnp.ndarray:
        """cost_volume: (B, H, W, C_in); ref_gaussian: (B, H, W, 2) =
        (mu_0, sigma_0). Returns (B, H, W, 2) updated (mu, sigma)."""
        y = relu(Conv(self.hidden, 3, padding=1, name="conv0")(cost_volume))
        y = relu(Conv(self.hidden, 1, name="conv1")(y))
        y = relu(Conv(self.hidden, 1, name="conv2")(y))
        y = Conv(self.out_ch, 1, name="conv3")(y)

        mu0 = ref_gaussian[..., 0:1]
        sigma0 = ref_gaussian[..., 1:2]
        mu1 = y[..., 0:1]
        sigma1 = y[..., 1:2]
        mu_new = mu0 + mu1 * sigma0
        sigma_new = (jax.nn.elu(sigma1.astype(jnp.float32)) + 1.0 + 1e-10
                     ).astype(sigma0.dtype) * sigma0
        return jnp.concatenate([mu_new, sigma_new], axis=-1)

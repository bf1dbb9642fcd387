"""F-Net: matching-feature extractor (reference models/FNET.py).

Dispatches on architecture name; only 'PSM-Net' exists in the reference
(FNET.py:13-15). Input (B, H, W, 3) -> features (B, H/4, W/4, feature_dim).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.psmnet import PSMNet


class FNet(nn.Module):
    architecture: str = "PSM-Net"
    feature_dim: int = 64
    remat: bool = False

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.architecture != "PSM-Net":
            raise ValueError(f"unknown F-Net arch {self.architecture!r}")
        return PSMNet(feature_dim=self.feature_dim, remat=self.remat,
                      name="f_net")(img, train)

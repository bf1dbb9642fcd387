"""G-Net: thin cost-volume -> residual Gaussian update (models/MAGNET.py:47-70).

A 4-layer CNN maps concat(cost volume, D-Net decoder feature) to a residual
update of the depth Gaussian in sigma-normalized space:
    mu_new    = mu_0 + mu_1 * sigma_0
    sigma_new = (elu(sigma_1) + 1 + 1e-10) * sigma_0

TPU restructuring of the first layer (torch ``gnet.0``, a single conv over
the 261-channel concat): a conv over a channel concat equals the sum of two
convs, so it is split into a cost-volume branch (``conv0_cv``, D channels,
no bias) and a feature branch (``conv0_feat``, 256 channels, carries the
bias). Two wins: the 256-channel conv is a clean 128-multiple matmul (the
261-channel concat was padded to 384 lanes and ran at ~4% MXU), and the
feature contribution is iteration-invariant — ``precompute_feature`` hoists
it out of the 3-iteration refinement loop. Checkpoint conversion splits the
torch kernel along input channels (compat/torch_loader.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.layers import Conv, relu


def _use_pallas_gnet() -> bool:
    import os
    env = os.environ.get("MAGNET_TPU_PALLAS_GNET", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


class GNet(nn.Module):
    hidden: int = 128
    out_ch: int = 2

    def setup(self):
        self.conv0_cv = Conv(self.hidden, 3, padding=1, use_bias=False,
                             name="conv0_cv")
        self.conv0_feat = Conv(self.hidden, 3, padding=1, use_bias=True,
                               name="conv0_feat")
        self.conv1 = Conv(self.hidden, 1, name="conv1")
        self.conv2 = Conv(self.hidden, 1, name="conv2")
        self.conv3 = Conv(self.out_ch, 1, name="conv3")

    def precompute_feature(self, feat: jnp.ndarray,
                           train: bool = False) -> jnp.ndarray:
        """Iteration-invariant contribution of the decoder feature to the
        first layer (compute once, reuse every refinement iteration)."""
        from magnet_tpu.kernels import headchain_pallas as hc
        if (not train and not self.is_initializing()
                and hc.use_pallas_heads() and hc.supported(feat.shape)):
            p = self.variables["params"]["conv0_feat"]["conv"]
            return hc.head_chain_pallas(
                feat, [(p["kernel"], p["bias"], False)],
                interpret=jax.default_backend() != "tpu")
        return self.conv0_feat(feat)

    def __call__(self, cost_volume: jnp.ndarray, feat_contrib: jnp.ndarray,
                 ref_gaussian: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """cost_volume: (B, H, W, D); feat_contrib: (B, H, W, hidden) from
        `precompute_feature`; ref_gaussian: (B, H, W, 2) = (mu_0, sigma_0).
        Returns (B, H, W, 2) updated (mu, sigma).

        Inference on TPU runs the whole update as one fused Pallas kernel
        (kernels/gnet_pallas.py) — op-by-op these four tiny convs at
        batch 1 are launch/layout-overhead bound (~1.4 ms/frame for
        ~4.5 GFLOP). This module remains the reference/training path;
        MAGNET_TPU_PALLAS_GNET=0/1 forces."""
        if (not train and not self.is_initializing()
                and _use_pallas_gnet()):
            from magnet_tpu.kernels import gnet_pallas as gp
            if gp.supported(cost_volume.shape, self.hidden,
                            cost_volume.dtype.itemsize):
                import jax as _jax
                return gp.gnet_update_pallas(
                    cost_volume, feat_contrib, ref_gaussian,
                    self.variables["params"],
                    interpret=_jax.default_backend() != "tpu")
        y = self.conv0_cv(cost_volume)
        y = relu(y + feat_contrib.astype(y.dtype))
        y = relu(self.conv1(y))
        y = relu(self.conv2(y))
        y = self.conv3(y)

        mu0 = ref_gaussian[..., 0:1]
        sigma0 = ref_gaussian[..., 1:2]
        mu1 = y[..., 0:1]
        sigma1 = y[..., 1:2]
        mu_new = mu0 + mu1 * sigma0
        sigma_new = (jax.nn.elu(sigma1.astype(jnp.float32)) + 1.0 + 1e-10
                     ).astype(sigma0.dtype) * sigma0
        return jnp.concatenate([mu_new, sigma_new], axis=-1)

"""Golden test of learned convex upsampling against torch semantics
(reference models/MAGNET.py:15-27)."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from magnet_tpu.ops import upsample


def torch_upsample_via_mask(depth, up_mask, k):
    """Torch spec of RAFT-style convex upsampling (independent
    implementation of the documented semantics, used as test oracle)."""
    N, o_dim, H, W = depth.shape
    m = up_mask.view(N, 1, 9, k, k, H, W)
    m = torch.softmax(m, dim=2)
    d = tF.unfold(depth, [3, 3], padding=1)
    d = d.view(N, o_dim, 9, 1, 1, H, W)
    out = torch.sum(m * d, dim=2)
    out = out.permute(0, 1, 4, 2, 5, 3)
    return out.reshape(N, o_dim, k * H, k * W)


def test_upsample_via_mask_matches_torch():
    rng = np.random.RandomState(0)
    B, H, W, C, k = 2, 6, 8, 2, 4
    depth = rng.randn(B, H, W, C).astype(np.float32)
    mask = rng.randn(B, H, W, 9 * k * k).astype(np.float32)

    ours = upsample.upsample_via_mask(jnp.asarray(depth), jnp.asarray(mask), k)

    t_depth = torch.from_numpy(depth).permute(0, 3, 1, 2)
    t_mask = torch.from_numpy(mask).permute(0, 3, 1, 2)
    ref = torch_upsample_via_mask(t_depth, t_mask, k)
    ref = ref.permute(0, 2, 3, 1).numpy()

    assert ours.shape == (B, H * k, W * k, C)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_upsample_bilinear_matches_torch():
    rng = np.random.RandomState(1)
    depth = rng.randn(1, 6, 8, 2).astype(np.float32)
    ours = upsample.upsample_bilinear(jnp.asarray(depth), None, 4)
    ref = tF.interpolate(torch.from_numpy(depth).permute(0, 3, 1, 2),
                         scale_factor=4, mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

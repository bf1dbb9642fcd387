"""Golden tests of resampling ops against torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from magnet_tpu.ops import resample


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(7, 9, 3), (16, 16, 4)])
def test_grid_sample_matches_torch(seed, shape):
    rng = np.random.RandomState(seed)
    H, W, C = shape
    feat = rng.randn(H, W, C).astype(np.float32)
    # Coordinates spanning in-bounds, boundary, and far out-of-bounds.
    P = 251
    gx = rng.uniform(-1.6, 1.6, size=P).astype(np.float32)
    gy = rng.uniform(-1.6, 1.6, size=P).astype(np.float32)
    gx[:5] = [-1.0, 1.0, 0.0, -3.0, 3.0]
    gy[:5] = [1.0, -1.0, 0.0, 3.0, -3.0]

    ours = resample.grid_sample(jnp.asarray(feat), jnp.asarray(gx),
                                jnp.asarray(gy))

    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]        # (1,C,H,W)
    grid = torch.from_numpy(np.stack([gx, gy], -1))[None, None]   # (1,1,P,2)
    ref = tF.grid_sample(t_feat, grid, mode="bilinear",
                         padding_mode="zeros", align_corners=False)
    ref = ref[0, :, 0, :].T.numpy()                               # (P, C)

    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((15, 20), (30, 40)),
                                          ((4, 6), (13, 7)),
                                          ((1, 2), (3, 5))])
def test_resize_bilinear_align_corners_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(0)
    (H, W), (oh, ow) = in_hw, out_hw
    x = rng.randn(2, H, W, 5).astype(np.float32)
    ours = resample.resize_bilinear_align_corners(jnp.asarray(x), oh, ow)

    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = tF.interpolate(t, size=(oh, ow), mode="bilinear",
                         align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


@pytest.mark.parametrize("hw,win", [((120, 160), 64), ((120, 160), 32),
                                    ((30, 40), 8), ((88, 304), 16)])
def test_avg_pool_matches_torch(hw, win):
    rng = np.random.RandomState(0)
    H, W = hw
    x = rng.randn(1, H, W, 3).astype(np.float32)
    ours = resample.avg_pool(jnp.asarray(x), win, win)
    ref = tF.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), win, win)
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_resize_nearest_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(1, 12, 17, 2).astype(np.float32)
    ours = resample.resize_nearest(jnp.asarray(x), 48, 68)
    ref = tF.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(48, 68), mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

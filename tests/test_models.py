"""Shape and sanity tests of the Flax model stack on tiny inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.models.dnet import DNet, DNetCoarse
from magnet_tpu.models.fnet import FNet
from magnet_tpu.models.magnet import (Magnet, MagnetF,
                                      gaussian_sampling_offsets,
                                      parse_weighting, sid_depth_centers)


def _rays_and_K(H, W):
    fx, fy = W * 1.2, H * 1.1
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]],
                 dtype=np.float32)
    grid = np.ones((H, W, 3), dtype=np.float32)
    grid[:, :, 0] = np.arange(W)[None] + 0.5
    grid[:, :, 1] = np.arange(H)[:, None] + 0.5
    rays = grid.copy()
    rays[:, :, 0] = (grid[:, :, 0] - K[0, 2]) / K[0, 0]
    rays[:, :, 1] = (grid[:, :, 1] - K[1, 2]) / K[1, 1]
    return K, rays.transpose(2, 0, 1).reshape(3, -1)


def test_dnet_forward_shapes():
    model = DNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 64, 64, 2)
    assert np.all(np.asarray(out[..., 1]) > 0)      # var positive


def test_dnet_coarse_shapes():
    model = DNetCoarse()
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    (gauss, feat) = model.apply(params, x)
    assert gauss.shape == (2, 16, 16, 2)
    assert feat.shape == (2, 16, 16, 256)
    assert np.all(np.asarray(gauss[..., 1]) > 0)    # sigma positive


def test_fnet_shapes():
    model = FNet(feature_dim=64)
    # H, W chosen so SPP's 64-pool is degenerate but valid after stride 4
    x = jnp.zeros((1, 256, 320, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 64, 80, 64)


def test_gaussian_sampling_offsets():
    from scipy.special import erf
    from scipy.stats import norm
    beta, n = 3, 5
    ks = gaussian_sampling_offsets(beta, n)
    assert ks.shape == (n,)
    # symmetric, increasing
    np.testing.assert_allclose(ks, -ks[::-1], atol=1e-6)
    assert np.all(np.diff(ks) > 0)
    # first bin center from the explicit formula
    p_total = erf(beta / np.sqrt(2))
    p0, p1 = (1 - p_total) / 2, (1 - p_total) / 2 + p_total / n
    np.testing.assert_allclose(ks[0], (norm.ppf(p0) + norm.ppf(p1)) / 2,
                               atol=1e-6)


def test_sid_depth_centers():
    d = sid_depth_centers(1e-3, 10.0, 80)
    assert d.shape == (80,)
    g = 1 - 1e-3
    edges = np.exp(np.log(10.0 + g) * np.arange(81) / 80) - g
    np.testing.assert_allclose(d, (edges[:-1] + edges[1:]) / 2, rtol=1e-5)
    assert abs(d[0] - (edges[0] + edges[1]) / 2) < 1e-6


def test_parse_weighting():
    assert parse_weighting("CW5") == 5.0
    assert parse_weighting("CW2") == 2.0
    with pytest.raises(ValueError):
        parse_weighting("XX3")


@pytest.fixture(scope="module")
def magnet_setup():
    B, V, H, W = 1, 2, 64, 64
    h, w = H // 4, W // 4
    K, rays = _rays_and_K(h, w)
    rng = np.random.RandomState(0)
    ref = rng.rand(B, H, W, 3).astype(np.float32)
    src = rng.rand(B, V, H, W, 3).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))
    t = rng.randn(B, V, 3).astype(np.float32) * 0.05
    valid = np.ones((B, V), np.float32)
    intM = np.tile(K, (B, 1, 1))
    rays_b = np.tile(rays, (B, 1, 1))
    return dict(ref=ref, src=src, R=R, t=t, valid=valid, intM=intM,
                rays=rays_b, dims=(B, V, H, W))


def test_magnet_forward(magnet_setup):
    s = magnet_setup
    B, V, H, W = s["dims"]
    model = Magnet(n_iters=2)
    args = (jnp.asarray(s["ref"]), jnp.asarray(s["src"]),
            jnp.asarray(s["R"]), jnp.asarray(s["t"]),
            jnp.asarray(s["valid"]), jnp.asarray(s["intM"]),
            jnp.asarray(s["rays"]))
    params = model.init(jax.random.PRNGKey(0), *args)
    preds = model.apply(params, *args)
    assert len(preds) == 2
    for p in preds:
        assert p.shape == (B, H, W, 2)
        assert np.isfinite(np.asarray(p)).all()
        assert np.all(np.asarray(p[..., 1]) > 0)


def test_magnet_f_forward(magnet_setup):
    s = magnet_setup
    B, V, H, W = s["dims"]
    d_center = jnp.asarray(sid_depth_centers(1e-3, 10.0, 16))
    model = MagnetF()
    args = (jnp.asarray(s["ref"]), jnp.asarray(s["src"]),
            jnp.asarray(s["R"]), jnp.asarray(s["t"]),
            jnp.asarray(s["valid"]), jnp.asarray(s["intM"]),
            jnp.asarray(s["rays"]), d_center)
    params = model.init(jax.random.PRNGKey(0), *args)
    cv = model.apply(params, *args)
    assert cv.shape == (B, H // 4, W // 4, 16)
    np.testing.assert_allclose(np.asarray(cv.sum(-1)), 1.0, atol=1e-5)

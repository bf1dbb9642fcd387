"""Pallas kernel tests (interpret mode on CPU; compiled parity is covered
by the TPU benchmark path)."""

import numpy as np

import jax.numpy as jnp

from magnet_tpu.kernels.upsample_pallas import upsample_via_mask_pallas
from magnet_tpu.ops.upsample import upsample_via_mask


def test_pallas_upsample_matches_xla_reference():
    rng = np.random.RandomState(0)
    B, H, W, C, k = 2, 16, 24, 2, 4
    depth = rng.randn(B, H, W, C).astype(np.float32)
    mask = rng.randn(B, H, W, 9 * k * k).astype(np.float32)

    ref = np.asarray(upsample_via_mask(jnp.asarray(depth),
                                       jnp.asarray(mask), k))
    out = np.asarray(upsample_via_mask_pallas(
        jnp.asarray(depth), jnp.asarray(mask), k, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_upsample_dpv_shape():
    """The production shape (120x160 coarse, k=4)."""
    rng = np.random.RandomState(1)
    depth = rng.rand(1, 120, 160, 2).astype(np.float32)
    mask = rng.randn(1, 120, 160, 144).astype(np.float32)
    ref = np.asarray(upsample_via_mask(jnp.asarray(depth),
                                       jnp.asarray(mask), 4))
    out = np.asarray(upsample_via_mask_pallas(
        jnp.asarray(depth), jnp.asarray(mask), 4, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)

"""Golden tests for the Pallas depthwise conv kernel (interpret mode on
CPU) against XLA's grouped convolution, plus dispatch gating."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magnet_tpu.kernels.dwconv_pallas import (choose_tile_h, dw_conv_pallas,
                                              supported)


def _ref(x, w, pad):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1])


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 20, 48), 3),     # stage-0-like
    ((1, 24, 40, 144), 5),    # 5x5 tap, non-128 channels
    ((1, 30, 10, 96), 3),     # H not divisible by 8 (tile_h 10)
    ((1, 15, 10, 64), 5),     # single-tile grid (tile_h 15)
])
def test_dwconv_matches_xla(shape, k):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, shape[-1]).astype(np.float32))
    pad = ((k // 2, k - 1 - k // 2), (k // 2, k - 1 - k // 2))
    assert supported(x.shape, k, k, (1, 1), pad)
    out = dw_conv_pallas(x, w, pad, interpret=True)
    np.testing.assert_allclose(out, _ref(x, w, pad), rtol=2e-5, atol=2e-5)


def test_dwconv_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 16, 12, 32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 1, 32)).astype(jnp.bfloat16)
    pad = ((1, 1), (1, 1))
    out = dw_conv_pallas(x, w, pad, interpret=True)
    ref = _ref(x, w, pad)
    np.testing.assert_allclose(out.astype(np.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_dwconv_gating():
    pad3 = ((1, 1), (1, 1))
    assert not supported((1, 16, 16, 8), 3, 3, (2, 2), pad3)   # strided
    assert not supported((1, 16, 16, 8), 3, 3, (1, 1),
                         ((0, 0), (1, 1)))                     # valid-pad
    # production trunk shapes all map to a tile
    for (h, w, c, k) in [(240, 320, 48, 3), (120, 160, 240, 3),
                         (60, 80, 384, 5), (30, 40, 1056, 5),
                         (15, 20, 1824, 5)]:
        assert choose_tile_h(h, w, c, k) is not None


def test_conv_dispatch_uses_same_params():
    """The Conv module's Pallas path must consume the identical parameter
    tree as the XLA grouped-conv path (checkpoint compatibility)."""
    from magnet_tpu.nn.layers import Conv
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 12, 24).astype(np.float32))
    m = Conv(24, 3, 1, padding="SAME", groups=24, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)                              # XLA path (dw_pallas off)
    old = os.environ.get("MAGNET_TPU_PALLAS_DW")
    os.environ["MAGNET_TPU_PALLAS_DW"] = "1"
    try:
        out = m.apply(v, x, dw_pallas=True)          # interpret on CPU
    finally:
        if old is None:
            os.environ.pop("MAGNET_TPU_PALLAS_DW")
        else:
            os.environ["MAGNET_TPU_PALLAS_DW"] = old
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

"""Golden tests for the fused head-chain Pallas kernel (interpret mode)
against the XLA modules it replaces (_Head, MagnetMaskHead,
GNet.precompute_feature)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from magnet_tpu.kernels.headchain_pallas import supported
from magnet_tpu.models.magnet import MagnetMaskHead
from magnet_tpu.nn.densedepth import _Head


class _env:
    def __init__(self, value):
        self.value = value

    def __enter__(self):
        self.old = os.environ.get("MAGNET_TPU_PALLAS_HEADS")
        os.environ["MAGNET_TPU_PALLAS_HEADS"] = self.value

    def __exit__(self, *a):
        if self.old is None:
            os.environ.pop("MAGNET_TPU_PALLAS_HEADS", None)
        else:
            os.environ["MAGNET_TPU_PALLAS_HEADS"] = self.old


def _x(N=2, H=24, W=20, C=256, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(N, H, W, C).astype(np.float32)) * 0.5


def test_head_matches_module():
    x = _x()
    assert supported(x.shape)
    m = _Head(out_ch=2)
    v = m.init(jax.random.PRNGKey(0), x)
    with _env("0"):
        ref = np.asarray(m.apply(v, x))
    with _env("1"):
        out = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_mask_head_matches_module():
    x = _x(N=1, H=40, W=24, seed=1)
    m = MagnetMaskHead(out_ch=144)
    v = m.init(jax.random.PRNGKey(1), x)
    with _env("0"):
        ref = np.asarray(m.apply(v, x))
    with _env("1"):
        out = np.asarray(m.apply(v, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_edge_rows_zero_padding():
    """Top/bottom rows exercise the clamped-window re-shift (the 3x3's
    zero padding at the image edge)."""
    x = _x(N=1, H=48, W=16, seed=2)
    m = _Head(out_ch=128)
    v = m.init(jax.random.PRNGKey(2), x)
    with _env("0"):
        ref = np.asarray(m.apply(v, x))
    with _env("1"):
        out = np.asarray(m.apply(v, x))
    for r in (0, 1, -2, -1):
        np.testing.assert_allclose(out[:, r], ref[:, r], rtol=1e-4,
                                   atol=1e-4 * float(np.abs(ref).max()))


def test_single_conv_chain():
    """GNet.precompute_feature shape: one 3x3, bias, no relu."""
    from magnet_tpu.kernels.headchain_pallas import head_chain_pallas
    x = _x(N=1, H=24, W=20, seed=3)
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(3, 3, 256, 128).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    out = np.asarray(head_chain_pallas(x, [(w, b, False)], interpret=True))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_supported_gates():
    assert supported((5, 120, 160, 256))     # ScanNet x_d3
    assert supported((5, 88, 304, 256))      # KITTI x_d3
    assert not supported((5, 120, 160, 60))  # channels not 128-multiple
    assert not supported((5, 7, 160, 256))   # no fitting tile

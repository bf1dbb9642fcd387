"""Golden tests for the fused layer2_0 downsample-block Pallas kernel
(interpret mode) against the XLA block it replaces (reference
models/submodules/F_psmnet.py:17-34, stride 2 + 1x1 projection)."""

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.kernels.psmtrans_pallas import downsample_block, supported


def _ref(x, w1, s1, t1, w2, s2, t2, wp, sp, tp):
    y = jax.lax.conv_general_dilated(
        x, w1, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y * s1 + t1)
    y = jax.lax.conv_general_dilated(
        y, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * s2 + t2
    proj = jax.lax.conv_general_dilated(
        x, wp, (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + proj * sp + tp


def _setup(N=2, H=32, W=24):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, W, 32).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.randn(3, 3, 32, 64).astype(np.float32)) * 0.08
    w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32)) * 0.06
    wp = jnp.asarray(rng.randn(1, 1, 32, 64).astype(np.float32)) * 0.1
    mk = lambda: (jnp.asarray(rng.rand(64).astype(np.float32)) + 0.5,
                  jnp.asarray(rng.randn(64).astype(np.float32)) * 0.1)
    s1, t1 = mk()
    s2, t2 = mk()
    sp, tp = mk()
    return x, w1, s1, t1, w2, s2, t2, wp, sp, tp


def test_downsample_block_matches_xla():
    args = _setup()
    ref = np.asarray(_ref(*args))
    out = np.asarray(downsample_block(*args, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_downsample_block_odd_geometry():
    """W not a multiple of 8 within the packed groups still exact
    (W=40: five quad groups in, five pair groups out)."""
    args = _setup(N=1, H=64, W=40)
    ref = np.asarray(_ref(*args))
    out = np.asarray(downsample_block(*args, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_supported_gates():
    assert supported((5, 240, 320, 32))     # ScanNet
    # KITTI (176x608) exceeds the whole-map VMEM budget at W=608 —
    # falls back to the XLA block (a row-banded variant could lift this)
    assert not supported((5, 176, 608, 32))
    assert not supported((5, 240, 320, 64))  # wrong channels
    assert not supported((5, 241, 320, 32))  # odd H
    assert not supported((5, 240, 324, 32))  # W % 8
    assert not supported((5, 26, 320, 32))   # no tile divides H/2

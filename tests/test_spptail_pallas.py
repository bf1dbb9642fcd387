"""Golden tests for the fused SPP-tail Pallas kernel (interpret mode)
against the XLA concat + conv + BN + ReLU + 1x1 chain it replaces
(reference models/submodules/F_psmnet.py:66-68,103-124)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.kernels.spptail_pallas import spp_tail_fused, supported


def _ref(raw, skip, br, w0, s0, t0, w1):
    cat = jnp.concatenate([raw, skip, br], axis=-1)
    y = jax.lax.conv_general_dilated(
        cat, w0, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.nn.relu(y * s0 + t0)
    return jnp.einsum("nhwc,cd->nhwd", y, w1)


def _setup(N=2, H=32, W=24):
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randn(N, H, W, 64).astype(np.float32)) * 0.5
    skip = jnp.asarray(rng.randn(N, H, W, 128).astype(np.float32)) * 0.5
    br = jnp.asarray(rng.randn(N, H, W, 128).astype(np.float32)) * 0.5
    w0 = jnp.asarray(rng.randn(3, 3, 320, 128).astype(np.float32)) * 0.03
    s0 = jnp.asarray(rng.rand(128).astype(np.float32)) + 0.5
    t0 = jnp.asarray(rng.randn(128).astype(np.float32)) * 0.1
    w1 = jnp.asarray(rng.randn(128, 64).astype(np.float32)) * 0.08
    return raw, skip, br, w0, s0, t0, w1


def test_spp_tail_matches_xla():
    args = _setup()
    ref = np.asarray(_ref(*args))
    out = np.asarray(spp_tail_fused(*args, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_spp_tail_edge_rows_zero_padded():
    """First/last output rows depend on the zero halo — compare them
    explicitly (the edge re-shift logic is the risky part)."""
    args = _setup(N=1, H=32, W=20)
    ref = np.asarray(_ref(*args))
    out = np.asarray(spp_tail_fused(*args, interpret=True))
    np.testing.assert_allclose(out[:, 0], ref[:, 0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out[:, -1], ref[:, -1], rtol=2e-5,
                               atol=2e-5)


def test_supported_gates():
    from magnet_tpu.kernels.spptail_pallas import _pick_tile
    assert supported((5, 120, 160, 128), 64)   # ScanNet dpv
    assert supported((5, 88, 304, 128), 64)    # KITTI dpv
    # KITTI's 304-wide maps must take a smaller row tile than ScanNet:
    # tile 22 statically estimates 15.0 MB and allocated 16.64 MB scoped
    # VMEM on a real v5e (over the 16 MB limit)
    assert _pick_tile(120, 160) == 24
    assert _pick_tile(88, 304) <= 11
    assert not supported((1, 4, 16, 128), 64)    # single tile only
    assert not supported((1, 13, 16, 128), 64)   # no tile divides H
    assert not supported((1, 32, 16, 64), 64)    # wrong skip channels
    assert not supported((5, 120, 160, 128), 256)  # feature_dim > 128


def test_psmnet_integrated_tail_dispatch():
    """Full PSMNet with the fused path env-forced (interpret) at a shape
    tall enough to engage the SPP-tail kernel must match the XLA path."""
    from magnet_tpu.nn.psmnet import PSMNet
    rng = np.random.RandomState(4)
    img = jnp.asarray(rng.rand(1, 128, 64, 3).astype(np.float32))
    m = PSMNet()
    v = m.init(jax.random.PRNGKey(0), img)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 rng.rand(*a.shape).astype(np.float32)) * 0.5 + 0.3,
             v["batch_stats"])}
    from magnet_tpu.kernels import spptail_pallas as spt
    assert spt.supported((1, 32, 16, 128), 64)
    old = os.environ.get("MAGNET_TPU_PALLAS_PSM")
    try:
        os.environ["MAGNET_TPU_PALLAS_PSM"] = "0"
        ref = np.asarray(m.apply(v, img, train=False))
        os.environ["MAGNET_TPU_PALLAS_PSM"] = "1"
        out = np.asarray(m.apply(v, img, train=False))
    finally:
        if old is None:
            os.environ.pop("MAGNET_TPU_PALLAS_PSM")
        else:
            os.environ["MAGNET_TPU_PALLAS_PSM"] = old
    np.testing.assert_allclose(out, ref, rtol=1e-3,
                               atol=2e-5 * float(np.abs(ref).max()))

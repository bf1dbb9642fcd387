"""Golden tests for the fused decoder up-stage Pallas kernel (interpret
mode) against the XLA UpSampleBN path it replaces
(D_dense_depth.py:29-42)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.kernels.upstage_pallas import supported
from magnet_tpu.nn.densedepth import UpSampleBN


def _with_env(value):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("MAGNET_TPU_PALLAS_UP")
            os.environ["MAGNET_TPU_PALLAS_UP"] = value

        def __exit__(self, *a):
            if self.old is None:
                os.environ.pop("MAGNET_TPU_PALLAS_UP", None)
            else:
                os.environ["MAGNET_TPU_PALLAS_UP"] = self.old
    return _Ctx()


def _setup(N=1, Hs=16, Ws=16, Cs=40):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, Hs, Ws, 512).astype(np.float32)) * 0.3
    skip = jnp.asarray(
        rng.randn(N, 2 * Hs, 2 * Ws, Cs).astype(np.float32)) * 0.3
    m = UpSampleBN(features=256)
    v = m.init(jax.random.PRNGKey(0), x, skip)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 rng.rand(*a.shape).astype(np.float32)) * 0.5 + 0.3,
             v["batch_stats"])}
    return m, v, x, skip


def test_upstage_fused_matches_module():
    m, v, x, skip = _setup()
    assert supported(x.shape, skip.shape)
    with _with_env("0"):
        ref = np.asarray(m.apply(v, x, skip))
    with _with_env("1"):
        out = np.asarray(m.apply(v, x, skip))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_upstage_edge_rows():
    """First/last rows exercise both the clamped DMA shifts and the mid
    halo zeroing (conv_b's zero padding)."""
    m, v, x, skip = _setup(Hs=20, Ws=12)
    with _with_env("0"):
        ref = np.asarray(m.apply(v, x, skip))
    with _with_env("1"):
        out = np.asarray(m.apply(v, x, skip))
    for r in (0, 1, -2, -1):
        np.testing.assert_allclose(out[:, r], ref[:, r], rtol=1e-4,
                                   atol=1e-4 * float(np.abs(ref).max()))


def test_supported_gates():
    assert supported((5, 60, 80, 512), (5, 120, 160, 40))  # ScanNet up3
    # KITTI up3 (88x304) fits the ring kernel's smaller working set
    assert supported((5, 44, 152, 512), (5, 88, 304, 40))
    assert not supported((5, 60, 80, 1024), (5, 120, 160, 64))  # up2
    assert not supported((5, 60, 80, 512), (5, 121, 160, 40))   # H != 2Hs

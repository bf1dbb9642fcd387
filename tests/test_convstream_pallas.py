"""Golden tests for the streaming-conv up2 kernel (interpret mode)
against the XLA UpSampleBN path it replaces (D_dense_depth.py:29-42 at
the 1024->512 decoder width)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.kernels.convstream_pallas import up2_supported
from magnet_tpu.nn.densedepth import UpSampleBN


def _with_env(value):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("MAGNET_TPU_PALLAS_UP2")
            os.environ["MAGNET_TPU_PALLAS_UP2"] = value

        def __exit__(self, *a):
            if self.old is None:
                os.environ.pop("MAGNET_TPU_PALLAS_UP2", None)
            else:
                os.environ["MAGNET_TPU_PALLAS_UP2"] = self.old
    return _Ctx()


def _setup(N=1, Hs=8, Ws=8, Cs=64):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, Hs, Ws, 1024).astype(np.float32)) * 0.3
    skip = jnp.asarray(
        rng.randn(N, 2 * Hs, 2 * Ws, Cs).astype(np.float32)) * 0.3
    m = UpSampleBN(features=512)
    v = m.init(jax.random.PRNGKey(0), x, skip)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 rng.rand(*a.shape).astype(np.float32)) * 0.5 + 0.3,
             v["batch_stats"])}
    return m, v, x, skip


def test_up2_fused_matches_module():
    m, v, x, skip = _setup()
    assert up2_supported(x.shape, skip.shape)
    with _with_env("0"):
        ref = np.asarray(m.apply(v, x, skip))
    with _with_env("1"):
        out = np.asarray(m.apply(v, x, skip))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_up2_edge_rows():
    """Odd tile count + first/last rows exercise the ring seed, the
    clamped bottom DMA shift, and both convs' zero row padding."""
    m, v, x, skip = _setup(Hs=10, Ws=6)
    with _with_env("0"):
        ref = np.asarray(m.apply(v, x, skip))
    with _with_env("1"):
        out = np.asarray(m.apply(v, x, skip))
    for r in (0, 1, -2, -1):
        np.testing.assert_allclose(out[:, r], ref[:, r], rtol=1e-4,
                                   atol=1e-4 * float(np.abs(ref).max()))


def test_supported_gates():
    assert up2_supported((5, 30, 40, 1024), (5, 60, 80, 64))    # ScanNet
    assert up2_supported((5, 22, 76, 1024), (5, 44, 152, 64))   # KITTI
    assert not up2_supported((5, 30, 40, 512), (5, 60, 80, 64))
    assert not up2_supported((5, 30, 40, 1024), (5, 61, 80, 64))

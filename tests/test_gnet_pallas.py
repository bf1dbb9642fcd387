"""Golden tests for the fused G-Net Pallas kernel (interpret mode on CPU)
against the GNet module's XLA path."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.nn.gnet import GNet
from magnet_tpu.kernels.gnet_pallas import supported


def _setup(B=2, H=24, W=20, D=5, dtype=np.float32):
    rng = np.random.RandomState(0)
    cv = jnp.asarray(rng.randn(B, H, W, D).astype(dtype))
    feat = jnp.asarray(rng.randn(B, H, W, 128).astype(dtype))
    prev = jnp.asarray(np.stack([rng.uniform(1, 4, (B, H, W)),
                                 rng.uniform(.1, .5, (B, H, W))],
                                -1).astype(dtype))
    m = GNet()
    vf = m.init(jax.random.PRNGKey(0), feat,
                method=GNet.precompute_feature)
    vc = m.init(jax.random.PRNGKey(1), cv,
                jnp.zeros((B, H, W, 128), cv.dtype), prev)
    v = {"params": {**vf["params"], **vc["params"]}}
    fc = m.apply(v, feat, method=GNet.precompute_feature)
    return m, v, cv, fc, prev


def _with_env(value):
    class _Ctx:
        def __enter__(self):
            self.old = os.environ.get("MAGNET_TPU_PALLAS_GNET")
            os.environ["MAGNET_TPU_PALLAS_GNET"] = value

        def __exit__(self, *a):
            if self.old is None:
                os.environ.pop("MAGNET_TPU_PALLAS_GNET", None)
            else:
                os.environ["MAGNET_TPU_PALLAS_GNET"] = self.old
    return _Ctx()


def test_gnet_fused_matches_module():
    m, v, cv, fc, prev = _setup()
    with _with_env("0"):
        ref = np.asarray(m.apply(v, cv, fc, prev))
    with _with_env("1"):
        out = np.asarray(m.apply(v, cv, fc, prev))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_gnet_train_path_differentiable_with_kernel_enabled():
    m, v, cv, fc, prev = _setup()
    with _with_env("1"):
        g = jax.grad(lambda p: m.apply({"params": p}, cv, fc, prev,
                                       train=True).sum())(v["params"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


def test_gnet_supported_gates():
    assert supported((1, 120, 160, 5), 128)    # ScanNet dpv
    assert supported((1, 88, 304, 5), 128)     # KITTI dpv
    assert not supported((1, 13, 16, 5), 128)  # no tile divides H
    assert not supported((1, 24, 16, 32), 128)  # D too large
    assert not supported((1, 24, 16, 5), 64)   # non-reference hidden

"""Golden tests for the fused MBConv-chain Pallas kernel (interpret mode)
against the module path it replaces (EfficientNet stride-1 block tails)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from magnet_tpu.kernels.mbchain_pallas import supported
from magnet_tpu.nn.efficientnet import EfficientNetB5Features


class _env:
    def __init__(self, value):
        self.value = value

    def __enter__(self):
        self.old = os.environ.get("MAGNET_TPU_PALLAS_MB")
        os.environ["MAGNET_TPU_PALLAS_MB"] = self.value

    def __exit__(self, *a):
        if self.old is None:
            os.environ.pop("MAGNET_TPU_PALLAS_MB", None)
        else:
            os.environ["MAGNET_TPU_PALLAS_MB"] = self.old


def test_mbchain_matches_modules():
    """Every stage tail runs through the fused chain at eval; the whole
    trunk must match the module path (randomized BN running stats so the
    eval-BN folding is actually exercised)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32)) * 0.5
    m = EfficientNetB5Features()
    v = m.init(jax.random.PRNGKey(0), x)
    # well-conditioned running stats (mean ~0, var ~1): with wild stats
    # the 30-block net amplifies even 1e-5 per-block rounding differences
    # exponentially, which tests the conditioning, not the kernel
    # (isolated chains match to ~1e-5 under any stats).
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 (0.05 * rng.randn(*a.shape)).astype(np.float32)),
             v["batch_stats"])}
    # variances must stay positive and near 1
    bs = v["batch_stats"]

    def fix(d):
        for k, val in d.items():
            if isinstance(val, dict):
                fix(val)
            elif k == "var":
                d[k] = jnp.abs(val) + 1.0
    fix(bs)
    with _env("0"):
        ref = m.apply(v, x)
    with _env("1"):
        out = m.apply(v, x)
    for i, (o, r) in enumerate(zip(out, ref)):
        o, r = np.asarray(o), np.asarray(r)
        np.testing.assert_allclose(
            o, r, rtol=2e-3, atol=2e-3 * float(np.abs(r).max()),
            err_msg=f"tap {i}")


def test_supported_gates():
    assert supported(30, 40, 128, 768, 6)    # stage 3 tail, 480x640 input
    assert supported(30, 40, 176, 1056, 6)   # stage 4 tail
    assert supported(15, 20, 304, 1824, 8)   # stage 5 tail
    assert supported(60, 80, 64, 384, 4)     # stage 2 tail (13.1 MB peak)
    # whole-map budget excludes the big early maps and stage 6's weights
    assert not supported(120, 160, 40, 240, 4)   # stage 1
    assert not supported(15, 20, 512, 3072, 2)   # stage 6

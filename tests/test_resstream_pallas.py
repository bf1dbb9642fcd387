"""Golden tests for the streaming BasicBlock Pallas kernel (interpret
mode) against the module path it replaces at KITTI shapes
(F_psmnet.py:28-34)."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from magnet_tpu.kernels.psmstage_pallas import fold_bn
from magnet_tpu.kernels.resstream_pallas import resblock_stream, supported
from magnet_tpu.nn.psmnet import BasicBlock, PSMNet


def _block_setup(H, W, C, dil, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32)) * 0.5
    m = BasicBlock(planes=C, stride=1, dilation=dil)
    v = m.init(jax.random.PRNGKey(seed), x)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 rng.rand(*a.shape).astype(np.float32)) * 0.5 + 0.3,
             v["batch_stats"])}
    return m, v, x


def _stream(m, v, x, dil):
    p = v["params"]
    st = v["batch_stats"]

    def bn(cb):
        return fold_bn(p[cb]["bn"]["bn"]["scale"], p[cb]["bn"]["bn"]["bias"],
                       st[cb]["bn"]["bn"]["mean"], st[cb]["bn"]["bn"]["var"])

    s1, t1 = bn("convbn1")
    s2, t2 = bn("convbn2")
    return resblock_stream(
        x, p["convbn1"]["conv"]["kernel"], s1, t1,
        p["convbn2"]["conv"]["kernel"], s2, t2, dilation=dil,
        interpret=True)


def test_resblock_matches_module_dil1():
    m, v, x = _block_setup(16, 24, 64, 1)
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(_stream(m, v, x, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_resblock_matches_module_dil2():
    """Dilation-2 taps reach 2 rows/cols out — exercises the wider halo
    rings and the d-row top/bottom zero seeding."""
    m, v, x = _block_setup(16, 20, 128, 2, seed=1)
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(_stream(m, v, x, 2))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_resblock_lane_pad_32ch():
    """C=32 lane-pads to 128; pad lanes must stay exactly zero through
    both convs and the residual."""
    m, v, x = _block_setup(8, 16, 32, 1, seed=2)
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(_stream(m, v, x, 1))
    np.testing.assert_allclose(out, ref, rtol=1e-4,
                               atol=1e-4 * float(np.abs(ref).max()))


def test_psmnet_dispatch_kitti_shape(monkeypatch):
    """Full PSM-Net with the whole-map chains forced unsupported (as at
    real KITTI shapes): the fused path must route every stride-1 block
    through the stream kernel and match the XLA path."""
    monkeypatch.setattr(PSMNet, "_chain_ok",
                        staticmethod(lambda *a, **k: False))
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(1, 64, 128, 3).astype(np.float32))
    m = PSMNet(feature_dim=64)
    v = m.init(jax.random.PRNGKey(0), x)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 rng.rand(*a.shape).astype(np.float32)) * 0.5 + 0.3,
             v["batch_stats"])}
    old = {k: os.environ.get(k) for k in ("MAGNET_TPU_PALLAS_PSM",
                                          "MAGNET_TPU_PALLAS_RST")}
    try:
        os.environ["MAGNET_TPU_PALLAS_PSM"] = "0"
        ref = np.asarray(m.apply(v, x))
        os.environ["MAGNET_TPU_PALLAS_PSM"] = "1"
        os.environ["MAGNET_TPU_PALLAS_RST"] = "1"
        out = np.asarray(m.apply(v, x))
    finally:
        for k, val in old.items():
            if val is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = val
    np.testing.assert_allclose(out, ref, rtol=2e-3,
                               atol=2e-3 * float(np.abs(ref).max()))


def test_supported_gates():
    assert supported((5, 88, 304, 64))           # KITTI layer2 tail
    assert supported((5, 88, 304, 128), 2)       # KITTI layer4 (dil 2)
    assert supported((5, 176, 608, 32))          # KITTI layer1
    assert not supported((5, 88, 304, 256))      # C > 128
    assert not supported((5, 87, 304, 64))       # no valid row tile

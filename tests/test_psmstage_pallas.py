"""Golden tests for the fused PSM-Net residual-stage Pallas kernel
(interpret mode on CPU) against an XLA reference chain, plus the
integrated PSMNet dispatch."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magnet_tpu.kernels.psmstage_pallas import (fold_bn,
                                                fused_residual_stage,
                                                pack_conv_natural,
                                                pack_conv_paired,
                                                pack_conv_quad, supported)

_PACK = {"natural": pack_conv_natural, "paired": pack_conv_paired,
         "quad": pack_conv_quad}


def _ref_chain(x, ws, ss, ts, d):
    """conv3x3(dil d)-affine-ReLU-conv3x3-affine-add blocks."""
    for b in range(len(ws) // 2):
        y = x
        for j in range(2):
            y = jax.lax.conv_general_dilated(
                y, ws[2 * b + j], (1, 1), ((d, d), (d, d)),
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y * ss[2 * b + j] + ts[2 * b + j]
            if j == 0:
                y = jax.nn.relu(y)
        x = x + y
    return x


@pytest.mark.parametrize("C,mode,d,hw,nb", [
    (32, "quad", 1, (16, 24), 2),     # layer1-like: pixel-quad packing
    (64, "paired", 1, (16, 20), 3),   # layer2-like: pixel-pair packing
    (128, "natural", 1, (16, 24), 2),  # layer3-like
    (128, "natural", 2, (16, 24), 2),  # layer4-like: dilation 2
])
def test_fused_stage_matches_xla(C, mode, d, hw, nb):
    rng = np.random.RandomState(0)
    H, W = hw
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32)) * 0.5
    ws = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32)) * 0.05
          for _ in range(2 * nb)]
    ss = [jnp.asarray(rng.rand(C).astype(np.float32)) + 0.5
          for _ in range(2 * nb)]
    ts = [jnp.asarray(rng.randn(C).astype(np.float32)) * 0.1
          for _ in range(2 * nb)]
    ref = _ref_chain(x, ws, ss, ts, d)
    pack = _PACK[mode]
    out = fused_residual_stage(x, jnp.stack([pack(w) for w in ws]),
                               jnp.stack(ss), jnp.stack(ts), d, mode,
                               interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_stem_chain_matches_xla():
    """residual=False: plain conv-BN-ReLU convs (the PSM stem
    firstconv1/2, F_psmnet.py:41-43) through the quad-packed kernel."""
    rng = np.random.RandomState(3)
    C, H, W = 32, 16, 24
    x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32)) * 0.5
    ws = [jnp.asarray(rng.randn(3, 3, C, C).astype(np.float32)) * 0.05
          for _ in range(2)]
    ss = [jnp.asarray(rng.rand(C).astype(np.float32)) + 0.5
          for _ in range(2)]
    ts = [jnp.asarray(rng.randn(C).astype(np.float32)) * 0.1
          for _ in range(2)]
    ref = x
    for j in range(2):
        ref = jax.lax.conv_general_dilated(
            ref, ws[j], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        ref = jax.nn.relu(ref * ss[j] + ts[j])
    out = fused_residual_stage(
        x, jnp.stack([pack_conv_quad(w) for w in ws]),
        jnp.stack(ss), jnp.stack(ts), 1, "quad", residual=False,
        interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fold_bn_matches_batchnorm():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
    g = jnp.asarray(rng.rand(16).astype(np.float32)) + 0.5
    b = jnp.asarray(rng.randn(16).astype(np.float32))
    mean = jnp.asarray(rng.randn(16).astype(np.float32))
    var = jnp.asarray(rng.rand(16).astype(np.float32)) + 0.1
    s, t = fold_bn(g, b, mean, var, 1e-5)
    ref = (x - mean) / jnp.sqrt(var + 1e-5) * g + b
    np.testing.assert_allclose(x * s + t, ref, rtol=1e-5, atol=1e-5)


def test_supported_gates():
    assert supported((1, 16, 20, 64), 3, 1)
    assert supported((1, 16, 24, 128), 2, 2)
    assert supported((1, 16, 24, 32), 3, 1)          # quad packing
    assert not supported((1, 13, 20, 64), 3, 1)      # no tile divides H
    assert not supported((1, 16, 21, 64), 3, 1)      # odd W paired
    assert not supported((1, 16, 22, 32), 3, 1)      # W % 4 quad
    assert not supported((1, 16, 20, 48), 3, 1)      # unsupported C
    assert not supported((1, 16, 20, 64), 3, 3)      # dilation > pad
    assert not supported((1, 16, 20, 64), 3, 2)      # packed + dilation
    # production shapes: ScanNet dpv 120x160 fits both stages in bf16;
    # stem/layer1 at 240x320 fit the quad stage; KITTI 88x304 fits the
    # paired stage, natural is VMEM-gated
    assert supported((5, 120, 160, 64), 15, 1)
    assert supported((5, 120, 160, 128), 3, 2)
    assert supported((5, 240, 320, 32), 3, 1)
    assert supported((5, 88, 304, 64), 15, 1)


def test_psmnet_integrated_dispatch():
    """Env-forced fused path (interpret) must match the XLA path through
    the full PSMNet, reading the same parameter tree."""
    from magnet_tpu.nn.psmnet import PSMNet
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    m = PSMNet()
    v = m.init(jax.random.PRNGKey(0), img)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(
             lambda a: jnp.asarray(
                 rng.rand(*a.shape).astype(np.float32)) * 0.5 + 0.3,
             v["batch_stats"])}
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
    # random untrained weights make the residual chain cancellation-heavy;
    # compare with an absolute tolerance scaled to the output magnitude
    # (accumulation order differs between the MXU kernel and XLA convs)
    np.testing.assert_allclose(out, ref, rtol=1e-3,
                               atol=2e-5 * float(np.abs(ref).max()))

"""End-to-end parity: torch oracle models with random weights -> converter
-> Flax models, outputs compared. This validates the EfficientNet SAME
padding/BN-eps/SE plumbing, decoder, PSM-Net, G-Net, and the checkpoint key
translation in one shot."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from magnet_tpu.compat import torch_loader
from magnet_tpu.models.dnet import DNet, DNetCoarse
from magnet_tpu.models.fnet import FNet
from magnet_tpu.nn.gnet import GNet

import torch_ref


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_dnet_full_parity():
    tmodel = torch_ref.randomize_(torch_ref.DNET_T(dnet=True), seed=3)
    x = np.random.RandomState(0).rand(1, 96, 128, 3).astype(np.float32)

    fmodel = DNet()
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = torch_loader.convert_dnet(_sd(tmodel), variables)
    ours = np.asarray(fmodel.apply(variables, jnp.asarray(x)))

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_dnet_coarse_parity():
    tmodel = torch_ref.randomize_(torch_ref.DNET_T(dnet=False), seed=4)
    x = np.random.RandomState(1).rand(1, 96, 128, 3).astype(np.float32)

    fmodel = DNetCoarse()
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = torch_loader.convert_dnet(_sd(tmodel), variables)
    gauss, feat = fmodel.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        ref_g, ref_f = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(gauss),
                               ref_g.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(feat),
                               ref_f.permute(0, 2, 3, 1).numpy(), atol=2e-4)


def test_fnet_full_parity():
    tmodel = torch_ref.randomize_(torch_ref.FNET_T(), seed=5)
    x = np.random.RandomState(2).rand(1, 256, 320, 3).astype(np.float32)

    fmodel = FNet(feature_dim=64)
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = torch_loader.convert_fnet(_sd(tmodel), variables)
    ours = np.asarray(fmodel.apply(variables, jnp.asarray(x)))

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert ours.shape == ref.shape
    # activations reach O(300) with random running stats; 1e-3 abs is
    # ~3e-6 relative — pure fp32 accumulation noise.
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_gnet_parity():
    """The split-first-layer G-Net (conv over concat == sum of convs, with
    the feature branch hoisted) must match the torch single-conv oracle
    through the converter's kernel-splitting path."""
    tmodel = torch_ref.randomize_(torch_ref.GNET_T(ch_in=261), seed=6)
    rng = np.random.RandomState(3)
    cv_d = rng.rand(1, 12, 16, 5).astype(np.float32)
    feat = rng.rand(1, 12, 16, 256).astype(np.float32)
    gmm = np.stack([rng.uniform(1, 5, (1, 12, 16)),
                    rng.uniform(0.1, 1, (1, 12, 16))],
                   axis=-1).astype(np.float32)

    def fwd(m, cv, ft, g):
        return m(cv, m.precompute_feature(ft), g)

    fmodel = GNet()
    variables = fmodel.init(jax.random.PRNGKey(0), jnp.asarray(cv_d),
                            jnp.asarray(feat), jnp.asarray(gmm),
                            method=fwd)
    # GNet alone maps through the magnet translator's g_net branch.
    sd = {f"g_net.{k}": v for k, v in _sd(tmodel).items()}
    from flax import traverse_util
    flat = traverse_util.flatten_dict(variables)
    prefixed = traverse_util.unflatten_dict(
        {("params", "g_net") + tuple(p[1:]): v for p, v in flat.items()})
    converted = torch_loader.convert(sd, prefixed, "magnet")
    variables = {"params":
                 traverse_util.unflatten_dict(
                     {tuple(p[2:]): v for p, v in
                      traverse_util.flatten_dict(converted).items()})}

    ours = np.asarray(fmodel.apply(variables, jnp.asarray(cv_d),
                                   jnp.asarray(feat), jnp.asarray(gmm),
                                   method=fwd))
    cv_full = np.concatenate([cv_d, feat], axis=-1)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(cv_full).permute(0, 3, 1, 2),
                     torch.from_numpy(gmm).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)

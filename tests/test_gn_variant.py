"""Parity of the GroupNorm + weight-standardized decoder variant
(DenseDepth_GN; reference D_dense_depth.py:46-77) and decoder depth
configurations (downsample_ratio 2/4/8)."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from magnet_tpu.nn.densedepth import DenseDepth, UpSampleGN
from magnet_tpu.nn.layers import WSConv


class TorchWSConv(nn.Conv2d):
    """Weight-standardized conv oracle (reference Conv2d semantics)."""

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=1, keepdim=True).mean(dim=2, keepdim=True) \
            .mean(dim=3, keepdim=True)
        w = w - mean
        std = w.view(w.size(0), -1).std(dim=1).view(-1, 1, 1, 1) + 1e-5
        return tF.conv2d(x, w / std.expand_as(w), self.bias, self.stride,
                         self.padding)


def test_wsconv_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 12, 6).astype(np.float32)
    tconv = TorchWSConv(6, 8, 3, padding=1)
    torch.manual_seed(0)
    nn.init.normal_(tconv.weight, 0, 0.3)
    nn.init.normal_(tconv.bias, 0, 0.1)

    model = WSConv(8, 3, padding=1)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = {"params": {
        "kernel": jnp.asarray(
            tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(tconv.bias.detach().numpy())}}
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


class TorchUpGN(nn.Module):
    def __init__(self, skip_input, out_f):
        super().__init__()
        self._net = nn.Sequential(
            TorchWSConv(skip_input, out_f, 3, padding=1),
            nn.GroupNorm(8, out_f), nn.LeakyReLU(),
            TorchWSConv(out_f, out_f, 3, padding=1),
            nn.GroupNorm(8, out_f), nn.LeakyReLU())

    def forward(self, x, skip):
        up = tF.interpolate(x, size=skip.shape[-2:], mode="bilinear",
                            align_corners=True)
        return self._net(torch.cat([up, skip], 1))


def test_upsample_gn_block_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 4, 5, 24).astype(np.float32)
    skip = rng.randn(1, 8, 10, 8).astype(np.float32)

    tblock = TorchUpGN(32, 16)
    torch.manual_seed(1)
    for m in tblock.modules():
        if isinstance(m, nn.Conv2d):
            nn.init.normal_(m.weight, 0, 0.2)
            nn.init.normal_(m.bias, 0, 0.1)
        elif isinstance(m, nn.GroupNorm):
            nn.init.uniform_(m.weight, 0.5, 1.5)
            nn.init.normal_(m.bias, 0, 0.1)
    tblock.eval()

    model = UpSampleGN(16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(skip))
    sd = {k: v.detach().numpy() for k, v in tblock.state_dict().items()}

    def kconv(w):
        return jnp.asarray(w.transpose(2, 3, 1, 0))

    params = {
        "conv_a": {"kernel": kconv(sd["_net.0.weight"]),
                   "bias": jnp.asarray(sd["_net.0.bias"])},
        "gn_a": {"gn": {"scale": jnp.asarray(sd["_net.1.weight"]),
                        "bias": jnp.asarray(sd["_net.1.bias"])}},
        "conv_b": {"kernel": kconv(sd["_net.3.weight"]),
                   "bias": jnp.asarray(sd["_net.3.bias"])},
        "gn_b": {"gn": {"scale": jnp.asarray(sd["_net.4.weight"]),
                        "bias": jnp.asarray(sd["_net.4.bias"])}},
    }
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(skip)))
    with torch.no_grad():
        ref = tblock(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(skip).permute(0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               atol=2e-5)


def test_densedepth_gn_variant_runs():
    model = DenseDepth(use_bn=False, as_dnet=True)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 64, 64, 2)


def test_densedepth_downsample_ratios():
    for ratio, ch in ((8, 512), (2, 128)):
        model = DenseDepth(downsample_ratio=ratio, as_dnet=False)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        depth, feat = model.apply(variables, x)
        assert depth.shape == (1, 64 // ratio, 64 // ratio, 2)
        assert feat.shape[-1] == ch

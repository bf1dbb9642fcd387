"""AdaBins encoder partial-load path (reference DNET.py:37-48)."""

import numpy as np

import jax
import jax.numpy as jnp

from magnet_tpu.compat import torch_loader
from magnet_tpu.models.dnet import DNet

import torch_ref


def test_adabins_encoder_partial_load():
    tenc = torch_ref.randomize_(torch_ref.Encoder(), seed=9)
    sd = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}
    assert any(k.startswith("original_model.") for k in sd)

    model = DNet()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))
    before_dec = np.asarray(
        variables["params"]["d_net"]["conv2"]["conv"]["kernel"]).copy()

    out = torch_loader.convert_adabins_encoder(sd, variables)

    # encoder loaded
    stem = np.asarray(
        out["params"]["d_net"]["encoder"]["conv_stem"]["conv"]["kernel"])
    ref = np.transpose(sd["original_model.conv_stem.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(stem, ref, atol=0)
    # BN running stats loaded too
    mean = np.asarray(
        out["batch_stats"]["d_net"]["encoder"]["bn1"]["bn"]["mean"])
    np.testing.assert_allclose(mean, sd["original_model.bn1.running_mean"],
                               atol=0)
    # decoder untouched
    after_dec = np.asarray(
        out["params"]["d_net"]["conv2"]["conv"]["kernel"])
    np.testing.assert_array_equal(before_dec, after_dec)

"""ImageNet-pretrained encoder initialization for D-Net training.

The reference constructs its encoder ``pretrained=True`` from torch.hub
(D_dense_depth.py:10-11), so every from-scratch D-Net training run starts
from ImageNet weights. magnet_tpu consumes the same hub state dict as a
file via ``--encoder_ckpt`` + ``compat.torch_loader.convert_hub_encoder``.

The hub checkpoint's key layout is vendored offline as
``torch_ref.EffNetB5Hub`` — a gen-efficientnet-shaped module whose
state-dict keys match ``torch.hub.load('rwightman/gen-efficientnet-
pytorch', 'tf_efficientnet_b5_ap')`` (the same stand-in the reference-
oracle tests use to satisfy torch.hub offline).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.compat import torch_loader
from magnet_tpu.models.dnet import DNet

import torch_ref
from test_reference_oracle import (_assert_converter_census, _census,
                                   _flax_shape_leaves)


def _hub_state_dict(seed=11):
    enc = torch_ref.randomize_(torch_ref.EffNetB5Hub(), seed=seed)
    return {k: v.detach().numpy() for k, v in enc.state_dict().items()}


def test_hub_encoder_key_census():
    """Every flax encoder leaf must map into the bare hub key set with
    the right (transposed) shape, and every hub key must be consumed —
    the offline proof that a real tf_efficientnet_b5_ap download will
    convert completely."""
    expected = _census(torch_ref.EffNetB5Hub())
    leaves = {p: v for p, v in
              _flax_shape_leaves(DNet(), (1, 96, 128, 3)).items()
              if p[1] == "d_net" and p[2] == "encoder"}
    assert leaves, "no encoder leaves found"
    _assert_converter_census(
        leaves, torch_loader.translate_hub_encoder, expected)


@pytest.fixture(scope="module")
def dnet_variables():
    return DNet().init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_hub_encoder_partial_load(dnet_variables):
    sd = _hub_state_dict()
    assert "conv_stem.weight" in sd          # bare layout, no prefix
    assert not any(k.startswith("original_model.") for k in sd)

    variables = dnet_variables
    before_dec = np.asarray(
        variables["params"]["d_net"]["conv2"]["conv"]["kernel"]).copy()

    out = torch_loader.convert_hub_encoder(sd, variables)

    stem = np.asarray(
        out["params"]["d_net"]["encoder"]["conv_stem"]["conv"]["kernel"])
    ref = np.transpose(sd["conv_stem.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(stem, ref, atol=0)
    mean = np.asarray(
        out["batch_stats"]["d_net"]["encoder"]["bn1"]["bn"]["mean"])
    np.testing.assert_allclose(mean, sd["bn1.running_mean"], atol=0)
    # decoder untouched (partial load)
    after_dec = np.asarray(
        out["params"]["d_net"]["conv2"]["conv"]["kernel"])
    np.testing.assert_array_equal(before_dec, after_dec)


def test_hub_encoder_truncated_ckpt_raises(dnet_variables):
    """A translated-but-absent torch key means a wrong/truncated
    checkpoint: must raise, not silently train a half-random encoder."""
    sd = _hub_state_dict()
    del sd["blocks.3.2.conv_pwl.weight"]
    with pytest.raises(KeyError, match="missing torch keys"):
        torch_loader.convert_hub_encoder(sd, dnet_variables)

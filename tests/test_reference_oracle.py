"""De-correlated parity + key-census tests against the ACTUAL reference
implementation mounted at /root/reference (imported at test time, never
copied into the repo).

Round-1 lesson: every model-level parity test compared against
tests/torch_ref.py, a clean-room oracle written from the same SURVEY
reading — a shared misreading (MAGNET's 4-conv mask head built as 3 convs)
passed on both sides. These tests break that correlation two ways:

1. Key census: for each released-checkpoint layout (DNET / FNET / MAGNET /
   AdaBins-encoder) the *reference's own nn.Modules* are instantiated and
   their state-dict (name -> shape) is taken as ground truth; the converter
   must map every flax leaf into that set and must consume every key in it
   (shapes checked, split-input convs summed).
2. Full-pipeline parity: the reference MAGNET.forward (its own homography
   / G-Net / mask-head / upsample code) runs on random weights and its
   outputs are compared against magnet_tpu.models.Magnet through the
   checkpoint converter.

The only non-reference ingredient is the EfficientNet trunk: the reference
pulls it from torch.hub (network, unavailable here), so torch.hub.load is
monkeypatched to return torch_ref.EffNetB5Hub — a gen-efficientnet-shaped
module whose child order reproduces the reference Encoder's feature taps
(D_dense_depth.py:17-25).
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from flax import traverse_util

from magnet_tpu.compat import torch_loader
from magnet_tpu.models.dnet import DNet
from magnet_tpu.models.fnet import FNet
from magnet_tpu.models.magnet import Magnet

import torch_ref

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules with torch.hub satisfied
    offline."""
    sys.path.insert(0, REF)
    orig_hub = torch.hub.load
    torch.hub.load = lambda *a, **k: torch_ref.EffNetB5Hub()
    try:
        import models.MAGNET as M           # noqa: reference code
        import models.DNET as D
        import models.FNET as F
        from models.submodules.D_dense_depth import Encoder as RefEncoder
        yield types.SimpleNamespace(MAGNET=M.MAGNET, DNET=D.DNET,
                                    FNET=F.FNET, GNET=M.GNET,
                                    RefEncoder=RefEncoder)
    finally:
        torch.hub.load = orig_hub
        sys.path.remove(REF)


def _args(**overrides):
    """The flag surface the reference model constructors read
    (train_scripts/magnet/scannet.txt defaults)."""
    ns = types.SimpleNamespace(
        output_type="G", output_dim=2,
        DNET_architecture="DenseDepth_BN", downsample_ratio=4,
        DNET_fix_encoder_weights="nothing",
        FNET_architecture="PSM-Net", FNET_feature_dim=64,
        MAGNET_sampling_range=3, MAGNET_num_samples=5,
        MAGNET_mvs_weighting="CW5", MAGNET_num_train_iter=3,
        MAGNET_num_test_iter=3, dpv_height=64, dpv_width=80,
        DNET_ckpt=None, FNET_ckpt=None)
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def _census(module: torch.nn.Module):
    """state-dict name -> shape, minus BN bookkeeping scalars."""
    return {k: tuple(v.shape) for k, v in module.state_dict().items()
            if not k.endswith("num_batches_tracked")}


def _flax_shape_leaves(model, *example_shapes):
    """Variable tree leaf shapes via eval_shape (no compute)."""
    inputs = [jax.ShapeDtypeStruct(s, jnp.float32) for s in example_shapes]
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *inputs)
    return traverse_util.flatten_dict(variables)


# conv kernels whose torch original is split along input channels
_SPLIT_FIRST = ("conv0_cv", "conv_a_up")    # take the LEADING input slab
_SPLIT_SECOND = ("conv0_feat", "conv_a_skip")  # take the TRAILING slab


def _assert_converter_census(flat_leaves, translate, expected,
                             allow_unmapped=False, dead_keys=()):
    """Every flax leaf must translate into `expected` with the right shape;
    every expected torch key must be consumed; split convs must cover the
    torch kernel's full input width."""
    covered = set()
    split_in_ch = {}
    for full_path, leaf in flat_leaves.items():
        path = tuple(full_path[1:])          # drop collection name
        try:
            tkey = translate(path)
        except KeyError:
            if allow_unmapped:
                continue
            raise
        assert tkey in expected, (
            f"converter maps {'/'.join(path)} -> {tkey!r}, which does not "
            f"exist in the reference state dict")
        shape = tuple(leaf.shape)
        tshape = expected[tkey]
        if path[-1] == "kernel" and len(tshape) == 4:
            flax_exp = (tshape[2], tshape[3], tshape[1], tshape[0])  # HWIO
            if any(s in path for s in _SPLIT_FIRST + _SPLIT_SECOND):
                assert (shape[0], shape[1], shape[3]) == \
                    (flax_exp[0], flax_exp[1], flax_exp[3]), \
                    f"{path} vs {tkey}: {shape} / torch {tshape}"
                split_in_ch[tkey] = split_in_ch.get(tkey, 0) + shape[2]
            else:
                assert shape == flax_exp, \
                    f"{path} vs {tkey}: {shape} / torch {tshape}"
        else:
            assert shape == tshape, \
                f"{path} vs {tkey}: {shape} / torch {tshape}"
        covered.add(tkey)
    for tkey, n_in in split_in_ch.items():
        assert n_in == expected[tkey][1], (
            f"split conv {tkey}: flax slabs cover {n_in} input channels, "
            f"torch kernel has {expected[tkey][1]}")
    missing = sorted(k for k in set(expected) - covered
                     if not any(k.startswith(d) for d in dead_keys))
    assert not missing, (
        f"{len(missing)} reference keys not consumed by the converter "
        f"(architecture drift?): {missing[:8]} ...")


# ------------------------------------------------------------- key census

def test_dnet_key_census(ref):
    expected = _census(ref.DNET(_args(), dnet=True))
    leaves = _flax_shape_leaves(DNet(), (1, 96, 128, 3))
    _assert_converter_census(leaves, torch_loader.translate_dnet, expected)


def test_fnet_key_census(ref):
    expected = _census(ref.FNET(_args()))
    leaves = _flax_shape_leaves(FNet(feature_dim=64), (1, 256, 320, 3))
    _assert_converter_census(leaves, torch_loader.translate_fnet, expected)


def test_adabins_encoder_key_census(ref):
    """The AdaBins partial load targets the encoder's own state dict
    (DNET.py:37-48: keys are 'original_model.*')."""
    expected = _census(ref.RefEncoder())
    leaves = {p: v for p, v in
              _flax_shape_leaves(DNet(), (1, 96, 128, 3)).items()
              if p[1] == "d_net" and p[2] == "encoder"}
    assert leaves, "no encoder leaves found"
    _assert_converter_census(
        leaves, torch_loader.translate_adabins_encoder, expected)


def _make_ref_magnet(ref, tmp_path, args=None):
    """Reference MAGNET needs on-disk D/F checkpoints (MAGNET.py:78-92)."""
    args = args or _args()
    dnet = ref.DNET(args, dnet=False)
    fnet = ref.FNET(args)
    dpath = os.path.join(str(tmp_path), "dnet.pt")
    fpath = os.path.join(str(tmp_path), "fnet.pt")
    torch.save({"model": dnet.state_dict()}, dpath)
    torch.save({"model": fnet.state_dict()}, fpath)
    args.DNET_ckpt, args.FNET_ckpt = dpath, fpath
    return ref.MAGNET(args)


def test_magnet_key_census(ref, tmp_path):
    """Would have caught round 1's 3-conv mask head: the reference MAGNET
    carries mask_head.{0,2,4,6} (MAGNET.py:112-117)."""
    expected = _census(_make_ref_magnet(ref, tmp_path))
    assert "mask_head.6.weight" in expected            # the 4th conv
    leaves = _flax_shape_leaves(
        Magnet(n_iters=3), (1, 256, 320, 3), (1, 2, 256, 320, 3),
        (1, 2, 3, 3), (1, 2, 3), (1, 2), (1, 3, 3), (1, 3, 64 * 80))
    # The frozen D-Net inside MAGNET was constructed with dnet=False, but
    # the reference Decoder still BUILDS its (3-conv) mask_head in that
    # mode and never calls it (D_dense_depth.py:156-160 vs :193-195) — so
    # released MAGNET checkpoints carry 6 dead tensors we rightly skip.
    _assert_converter_census(
        leaves, torch_loader.translate_magnet, expected,
        dead_keys=("d_net.d_net.decoder.mask_head.",))


# ------------------------------------------------- full-pipeline parity

def test_magnet_full_reference_parity(ref, tmp_path):
    """Random-weight reference MAGNET.forward (its own homography/G-Net/
    mask-head code) vs magnet_tpu Magnet through the checkpoint converter.
    B=2, V=2 also exercises the view-major neighbor layout
    (homography.py:105: nghbr index = B*i_view + i_batch).

    The random weights are tempered so mu/sigma stay O(1) across the three
    refinement iterations: untempered random heads push predictions to
    ~1e8, where the binary consistency threshold (homography.py:158)
    chaotically amplifies fp32 noise and the comparison is ill-conditioned.
    With tempering, updates remain meaningful (mean |step| ~ 0.1 per
    iteration, asserted below) and parity is ~1e-6."""
    tmodel = torch_ref.randomize_(_make_ref_magnet(ref, tmp_path), seed=7)
    with torch.no_grad():
        dh = tmodel.d_net.d_net.decoder.depth_head[4]
        dh.weight.mul_(1e-3)
        dh.bias.zero_(); dh.bias[0] = 2.0; dh.bias[1] = 0.2
        gl = tmodel.g_net.gnet[6]
        gl.weight.mul_(3e-3); gl.bias.zero_()
        fl = tmodel.f_net.f_net.lastconv[2]
        fl.weight.mul_(0.1)

    B, V, H, W = 2, 2, 256, 320
    h, w = H // 4, W // 4
    rng = np.random.RandomState(11)
    ref_img = rng.rand(B, H, W, 3).astype(np.float32)
    src_imgs = rng.rand(B, V, H, W, 3).astype(np.float32)

    # small random rotations + translations
    def rot(axis, ang):
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(3, dtype=np.float32)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = c; m[j, j] = c; m[i, j] = -s; m[j, i] = s
        return m
    R = np.stack([np.stack([rot(rng.randint(3), rng.uniform(-0.05, 0.05))
                            for _ in range(V)]) for _ in range(B)])
    t = rng.uniform(-0.1, 0.1, (B, V, 3)).astype(np.float32)
    is_valid = np.ones((B, V), np.float32)
    is_valid[1, 1] = 0.0                       # exercise the validity mask

    fx, fy = w * 1.2, h * 1.1
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]], np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = np.tile(grid.transpose(2, 0, 1).reshape(1, 3, -1), (B, 1, 1))
    intM = np.tile(K, (B, 1, 1))

    # ---- reference forward (NCHW, view-major neighbor concat)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
    poses[:, :, :3, :3] = R
    poses[:, :, :3, 3] = t
    nghbr = np.concatenate([src_imgs[:, v] for v in range(V)], axis=0)
    with torch.no_grad():
        ref_preds = tmodel(
            torch.from_numpy(ref_img).permute(0, 3, 1, 2),
            torch.from_numpy(nghbr).permute(0, 3, 1, 2),
            torch.from_numpy(poses),
            torch.from_numpy(is_valid).int(),
            {"intM": torch.from_numpy(intM),
             "unit_ray_array_2D": torch.from_numpy(rays)},
            mode="test")

    # ---- ours through the converter
    fmodel = Magnet(n_iters=3)
    inputs = tuple(jnp.asarray(a) for a in
                   (ref_img, src_imgs, R.astype(np.float32), t, is_valid,
                    intM, rays))
    variables = jax.eval_shape(fmodel.init, jax.random.PRNGKey(0), *inputs)
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                             variables)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = torch_loader.convert_magnet(sd, variables)
    ours = fmodel.apply(variables, *inputs)

    assert len(ours) == len(ref_preds) == 3
    prev = None
    for i, (o, r) in enumerate(zip(ours, ref_preds)):
        r = r.permute(0, 2, 3, 1).numpy()
        o = np.asarray(o)
        assert o.shape == r.shape == (B, H, W, 2)
        np.testing.assert_allclose(o, r, atol=1e-4,
                                   err_msg=f"iteration {i}")
        if prev is not None:   # the refinement loop must actually refine
            assert np.abs(r - prev).mean() > 0.01, f"iteration {i} no-op"
        prev = r

"""Model construction + checkpoint loading from parsed args.

Mirrors the reference's model-from-args dispatch (DNET.py:23-34,
FNET.py:12-17, MAGNET.py:73-118) and its staged checkpoint composition:
MaGNet is built from a D-Net ckpt + F-Net ckpt (frozen) plus its own
trained g_net/mask_head (MAGNET.py:78-92, test_MaGNet.py:166-169).

Checkpoint paths ending in ``.pt`` are torch checkpoints (converted via
compat.torch_loader); directories are orbax TrainState checkpoints.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.compat import torch_loader
from magnet_tpu.models.dnet import DNet
from magnet_tpu.models.fnet import FNet
from magnet_tpu.models.magnet import Magnet


def _use_bn(args) -> bool:
    arch = getattr(args, "DNET_architecture", "DenseDepth_BN")
    if not arch.startswith("DenseDepth"):
        raise ValueError(f"unknown D-Net architecture {arch!r}")
    return arch.split("_")[1] == "BN"


def build_dnet(args, init_hw: Tuple[int, int] = None):
    model = DNet(output_dim=args.output_dim,
                 output_type=args.output_type,
                 downsample_ratio=args.downsample_ratio,
                 use_bn=_use_bn(args),
                 remat=getattr(args, "remat", False))
    h, w = init_hw or (args.input_height, args.input_width)
    variables = model.init(jax.random.PRNGKey(getattr(args, "seed", 0)),
                           jnp.zeros((1, h, w, 3), jnp.float32))
    return model, variables


def build_fnet(args, init_hw: Tuple[int, int] = None):
    model = FNet(architecture=args.FNET_architecture,
                 feature_dim=args.FNET_feature_dim,
                 remat=getattr(args, "remat", False))
    h, w = init_hw or (args.input_height, args.input_width)
    variables = model.init(jax.random.PRNGKey(getattr(args, "seed", 0)),
                           jnp.zeros((1, h, w, 3), jnp.float32))
    return model, variables


def build_magnet(args, init_hw: Tuple[int, int] = None,
                 n_views: int = None):
    model = Magnet(output_dim=getattr(args, "output_dim", 2),
                   downsample_ratio=args.downsample_ratio,
                   use_bn=_use_bn(args),
                   fnet_feature_dim=args.FNET_feature_dim,
                   sampling_range=args.MAGNET_sampling_range,
                   n_samples=args.MAGNET_num_samples,
                   mvs_weighting=args.MAGNET_mvs_weighting,
                   n_iters=args.MAGNET_num_test_iter)
    h, w = init_hw or (args.input_height, args.input_width)
    V = n_views or args.MAGNET_num_source_views
    hh, ww = h // args.downsample_ratio, w // args.downsample_ratio
    variables = model.init(
        jax.random.PRNGKey(getattr(args, "seed", 0)),
        jnp.zeros((1, h, w, 3)), jnp.zeros((1, V, h, w, 3)),
        jnp.zeros((1, V, 3, 3)), jnp.zeros((1, V, 3)),
        jnp.ones((1, V)), jnp.eye(3)[None],
        jnp.zeros((1, 3, hh * ww)))
    return model, variables


def _is_torch_ckpt(path: str) -> bool:
    return os.path.isfile(path)


def load_dnet_checkpoint(variables, path: str):
    if not path:
        # empty --ckpt_path: evaluate the initialized model (smoke runs
        # without weights; mirrors load_magnet_checkpoints' empty-skip)
        return variables
    if _is_torch_ckpt(path):
        sd = torch_loader.load_state_dict(path)
        return torch_loader.convert_dnet(sd, variables)
    from magnet_tpu.train import checkpoint
    restored = checkpoint.restore(path, None)
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}


def load_magnet_checkpoints(variables, args):
    """Stage composition: load frozen D-Net + F-Net weights into the
    Magnet tree; then, if MAGNET_ckpt given, overlay the full tree
    (g_net/mask_head + the same frozen nets; MAGNET.py:78-92 +
    test_MaGNet.py:166-169)."""
    v = jax.tree.map(lambda x: x, variables)      # rebuilt container copy

    def sub(tree, key):
        return {c: tree[c][key] for c in ("params", "batch_stats")
                if c in tree and key in tree[c]}

    def set_sub(tree, key, new):
        for c in new:
            tree[c][key] = new[c]

    if getattr(args, "DNET_ckpt", ""):
        dn = sub(v, "d_net")
        if _is_torch_ckpt(args.DNET_ckpt):
            sd = torch_loader.load_state_dict(args.DNET_ckpt)
            # magnet's d_net (DNetCoarse) shares the DNET ckpt layout
            dn = torch_loader.convert_dnet(sd, dn)
        else:
            # orbax TrainState from our train_DNet.py: DNet params are
            # {'d_net': DenseDepth} — the exact DNetCoarse subtree.
            from magnet_tpu.train import checkpoint
            restored = checkpoint.restore(args.DNET_ckpt)
            dn = {"params": restored["params"],
                  "batch_stats": restored.get("batch_stats", {})}
        set_sub(v, "d_net", dn)
    if getattr(args, "FNET_ckpt", ""):
        fn = sub(v, "f_net")
        if _is_torch_ckpt(args.FNET_ckpt):
            sd = torch_loader.load_state_dict(args.FNET_ckpt)
            fn = torch_loader.convert_fnet(sd, fn)
        else:
            # orbax TrainState from train_FNet.py (MagnetF): params are
            # {'f_net': FNet-tree}; the FNet-tree is what magnet expects.
            from magnet_tpu.train import checkpoint
            restored = checkpoint.restore(args.FNET_ckpt)
            fn = {"params": restored["params"]["f_net"],
                  "batch_stats": restored.get(
                      "batch_stats", {}).get("f_net", {})}
        set_sub(v, "f_net", fn)
    if getattr(args, "MAGNET_ckpt", ""):
        path = args.MAGNET_ckpt
        if _is_torch_ckpt(path):
            sd = torch_loader.load_state_dict(path)
            v = torch_loader.convert_magnet(sd, v)
        else:
            from magnet_tpu.train import checkpoint
            restored = checkpoint.restore(path, None)
            v = {"params": restored["params"],
                 "batch_stats": restored.get("batch_stats", {})}
    return v

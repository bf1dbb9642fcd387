"""PyTorch checkpoint -> Flax variable conversion.

The reference distributes trained weights as torch ``.pt`` state dicts
(ckpts/download.py:34-52) with layouts produced by its module trees
(DNET/FNET/MAGNET). This module converts those checkpoints into the Flax
variable trees of magnet_tpu's models so released weights can be evaluated
for metric parity.

Conversion is rule-based: each Flax leaf path is translated to its torch key
by pattern rules mirroring the torch module structure — ``Sequential``
indices for the decoder blocks/heads (D_dense_depth.py:32-37,148-160),
``blocks.{stage}.{idx}.*`` for the gen-efficientnet encoder, nested
``Sequential`` pairs for PSM-Net's convbn (F_psmnet.py:10-15), and
``gnet.{0,2,4,6}`` for G-Net (MAGNET.py:51-56). Conv kernels transpose
OIHW -> HWIO; norm vectors copy through.

Checkpoint prefixes:
  DNET ckpt:   d_net.{encoder|decoder}...            (DNET.py:28)
  FNET ckpt:   f_net....                             (FNET.py:15)
  MAGNET ckpt: d_net.d_net...., f_net.f_net....,
               g_net.gnet.N, mask_head.N             (MAGNET.py:80-118)
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np
from flax import traverse_util

_HEAD_IDX = {"conv0": "0", "conv1": "2", "conv2": "4"}
# MAGNET's own mask head has a 4th conv (MAGNET.py:112-117)
_HEAD4_IDX = {"conv0": "0", "conv1": "2", "conv2": "4", "conv3": "6"}
_GNET_IDX = {"conv1": "2", "conv2": "4", "conv3": "6"}
_UP_IDX = {"conv_a": "_net.0", "conv_a_up": "_net.0",
           "conv_a_skip": "_net.0", "bn_a": "_net.1", "gn_a": "_net.1",
           "conv_b": "_net.3", "bn_b": "_net.4", "gn_b": "_net.4"}
_FIRSTCONV_IDX = {"firstconv0": "0", "firstconv1": "2", "firstconv2": "4"}


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a checkpoint: unwrap the 'model' key and DDP 'module.'
    prefixes (utils/utils.py:46-56, MAGNET.py:31-43); return numpy."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _leaf(parts) -> str:
    """Trailing flax leaf -> torch parameter suffix. Norm leaves live under
    a 'bn'/'gn' wrapper scope; conv kernels under 'conv' or directly
    (WSConv)."""
    if parts[-2] in ("bn", "gn"):
        return {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}[parts[-1]]
    return {"kernel": "weight", "bias": "bias"}[parts[-1]]


def translate_densedepth(parts: Tuple[str, ...]) -> str:
    """Path inside a DenseDepth scope -> torch key inside the reference
    DenseDepth module (encoder.original_model.* / decoder.*)."""
    head = parts[0]
    if head == "encoder":
        sub = parts[1]
        m = re.match(r"blocks_(\d+)_(\d+)$", sub)
        if m:
            block = f"blocks.{m.group(1)}.{m.group(2)}"
            inner = parts[2]
            if inner == "se":
                return (f"encoder.original_model.{block}.se."
                        f"{parts[3]}.{_leaf(parts)}")
            return f"encoder.original_model.{block}.{inner}.{_leaf(parts)}"
        return f"encoder.original_model.{sub}.{_leaf(parts)}"
    if re.match(r"up\d$", head):
        return f"decoder.{head}.{_UP_IDX[parts[1]]}.{_leaf(parts)}"
    if head == "conv2":
        return f"decoder.conv2.{_leaf(parts)}"
    if head in ("depth_head", "mask_head"):
        return f"decoder.{head}.{_HEAD_IDX[parts[1]]}.{_leaf(parts)}"
    raise KeyError(f"unmapped DenseDepth path {parts}")


def translate_psmnet(parts: Tuple[str, ...]) -> str:
    """Path inside a PSMNet scope -> torch key inside the reference PSMNet."""
    head = parts[0]
    leaf = _leaf(parts)
    is_bn = parts[-2] == "bn"
    cb = "1" if is_bn else "0"

    if head in _FIRSTCONV_IDX:
        return f"firstconv.{_FIRSTCONV_IDX[head]}.{cb}.{leaf}"
    m = re.match(r"layer(\d+)_(\d+)$", head)
    if m:
        base = f"layer{m.group(1)}.{m.group(2)}"
        inner = parts[1]
        if inner == "convbn1":
            return f"{base}.conv1.0.{cb}.{leaf}"
        if inner == "convbn2":
            return f"{base}.conv2.{cb}.{leaf}"
        if inner == "down_conv":
            return f"{base}.downsample.0.{leaf}"
        if inner == "down_bn":
            return f"{base}.downsample.1.{leaf}"
        raise KeyError(f"unmapped BasicBlock path {parts}")
    if re.match(r"branch\d$", head):
        return f"{head}.1.{cb}.{leaf}"
    if head == "lastconv0":
        return f"lastconv.0.{cb}.{leaf}"
    if head == "lastconv1":
        return f"lastconv.2.{leaf}"
    raise KeyError(f"unmapped PSMNet path {parts}")


def translate_dnet(parts: Tuple[str, ...]) -> str:
    """Flax DNet/DNetCoarse variables -> torch DNET state-dict key."""
    assert parts[0] == "d_net", parts
    return "d_net." + translate_densedepth(parts[1:])


def translate_fnet(parts: Tuple[str, ...]) -> str:
    """Flax FNet variables -> torch FNET state-dict key."""
    assert parts[0] == "f_net", parts
    return "f_net." + translate_psmnet(parts[1:])


def translate_magnet(parts: Tuple[str, ...]) -> str:
    """Flax Magnet variables -> torch MAGNET state-dict key."""
    top = parts[0]
    if top == "d_net":                     # DNetCoarse -> DenseDepth
        assert parts[1] == "d_net", parts
        return "d_net.d_net." + translate_densedepth(parts[2:])
    if top == "f_net":                     # FNet -> PSMNet
        assert parts[1] == "f_net", parts
        return "f_net.f_net." + translate_psmnet(parts[2:])
    if top == "g_net":
        if parts[1] in ("conv0_cv", "conv0_feat"):
            # split of torch gnet.0 along input channels; resolved by the
            # special-case slicing in convert()
            return f"g_net.gnet.0.{_leaf(parts)}"
        return f"g_net.gnet.{_GNET_IDX[parts[1]]}.{_leaf(parts)}"
    if top == "mask_head":
        return f"mask_head.{_HEAD4_IDX[parts[1]]}.{_leaf(parts)}"
    raise KeyError(f"unmapped Magnet path {parts}")


def translate_adabins_encoder(parts: Tuple[str, ...]) -> str:
    """AdaBins encoder-only checkpoint (DNET.py:37-48): keys are the
    encoder's own state dict ('original_model.*'); non-encoder paths are
    unmapped (the caller uses strict=False to keep them)."""
    if parts[0] == "d_net" and parts[1] == "encoder":
        inner = translate_densedepth(parts[1:])
        assert inner.startswith("encoder.")
        return inner[len("encoder."):]
    raise KeyError(f"not an encoder path {parts}")


def translate_hub_encoder(parts: Tuple[str, ...]) -> str:
    """Bare torch.hub ``tf_efficientnet_b5_ap`` (ImageNet-pretrained)
    state dict — the source of the reference encoder's ``pretrained=True``
    construction (D_dense_depth.py:10-11). Keys are the GenEfficientNet's
    own (conv_stem / bn1 / blocks.{stage}.{idx}.* / conv_head / bn2),
    i.e. the AdaBins encoder layout minus its 'original_model.' prefix.
    Non-encoder paths are unmapped (partial load keeps them at init)."""
    inner = translate_adabins_encoder(parts)
    prefix = "original_model."
    assert inner.startswith(prefix), inner
    return inner[len(prefix):]


_TRANSLATORS = {"dnet": translate_dnet, "fnet": translate_fnet,
                "magnet": translate_magnet,
                "adabins_encoder": translate_adabins_encoder,
                "hub_encoder": translate_hub_encoder}


def convert(state_dict: Dict[str, np.ndarray], variables,
            model_kind: str, strict: bool = True,
            missing_ok: bool = None):
    """Fill a Flax variable tree (params + batch_stats collections) from a
    torch state dict; returns a new tree of identical structure.

    ``strict`` governs UNMAPPED flax paths (no translation rule): raise
    vs keep-at-init. ``missing_ok`` governs mapped-but-ABSENT torch keys;
    it defaults to ``not strict`` for compatibility, but partial encoder
    loads pass missing_ok=False — a translated key missing from the
    checkpoint means a wrong/truncated file, and silently training from a
    half-random encoder would be worse than failing."""
    translate = _TRANSLATORS[model_kind]
    flat = traverse_util.flatten_dict(variables)
    out, missing = {}, []
    for full_path, value in flat.items():
        path = tuple(full_path[1:])        # drop collection name
        try:
            tkey = translate(path)
        except KeyError:
            if strict:
                raise
            out[full_path] = value
            continue
        if tkey not in state_dict:
            missing.append(tkey)
            out[full_path] = value
            continue
        w = state_dict[tkey]
        if path[-1] == "kernel" and w.ndim == 4:
            w = _conv_kernel(w)
            # Concat-input convs are split along input channels (conv
            # over a concat == sum of convs): G-Net's first layer
            # (nn/gnet.py) takes cost-volume channels first, decoder
            # feature second; the decoder's UpSampleBN conv_a
            # (nn/densedepth.py) takes upsampled channels first, encoder
            # skip second.
            if any(s in path for s in ("conv0_cv", "conv_a_up")):
                w = w[:, :, :np.asarray(value).shape[2], :]
            elif any(s in path for s in ("conv0_feat", "conv_a_skip")):
                w = w[:, :, -np.asarray(value).shape[2]:, :]
        w = np.asarray(w)
        if w.shape != np.asarray(value).shape:
            raise ValueError(f"shape mismatch {'/'.join(path)} <- {tkey}: "
                             f"{w.shape} vs {np.asarray(value).shape}")
        out[full_path] = w.astype(np.asarray(value).dtype)
    if missing_ok is None:
        missing_ok = not strict
    if missing and not missing_ok:
        raise KeyError(
            f"missing torch keys ({len(missing)}): {missing[:10]} ...")
    return traverse_util.unflatten_dict(out)


def convert_dnet(state_dict, variables, strict: bool = True):
    return convert(state_dict, variables, "dnet", strict)


def convert_fnet(state_dict, variables, strict: bool = True):
    return convert(state_dict, variables, "fnet", strict)


def convert_magnet(state_dict, variables, strict: bool = True):
    return convert(state_dict, variables, "magnet", strict)


def convert_adabins_encoder(state_dict, variables):
    """Partial load: fill only the encoder subtree, leave the rest at
    init (the optimizer freezes the encoder; train/optim.py)."""
    return convert(state_dict, variables, "adabins_encoder", strict=False,
                   missing_ok=False)


def convert_hub_encoder(state_dict, variables):
    """Partial load of a bare torch.hub ``tf_efficientnet_b5_ap``
    ImageNet state dict into the D-Net encoder subtree — the TPU
    equivalent of the reference's ``pretrained=True`` encoder
    construction (D_dense_depth.py:10-11): fresh D-Net training starts
    from ImageNet features instead of random init. The encoder stays
    TRAINABLE (unlike the AdaBins path, which freezes it); the optimizer
    already gives it lr/10 (train_DNet.py:48-53 parity)."""
    return convert(state_dict, variables, "hub_encoder", strict=False,
                   missing_ok=False)

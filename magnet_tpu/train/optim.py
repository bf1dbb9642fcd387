"""Optimizers and schedules (optax).

Mirrors the reference training recipe (train_DNet.py:44-57,96-101):
AdamW (wd 0.01, peak lr 3.57e-4), OneCycle LR stepped per iteration
(div_factor 25, final_div_factor 1e4), global grad-norm clip 1.0. The
encoder trains at lr/10 unless ``same_lr`` (train_DNet.py:48-53).

Deviations (documented): torch OneCycleLR also cycles Adam beta1
(0.95 -> 0.85 -> 0.95); we keep beta1 fixed at 0.9 — a minor training-
dynamics difference, not an API one. The reference's CUDA GradScaler
(train_DNet.py:62) has no TPU equivalent: bf16 keeps f32's exponent range.

Frozen submodules (MaGNet stage: D-Net, F-Net; MAGNET.py:82-92) get
``optax.set_to_zero`` so neither gradients nor weight decay ever touch
them.
"""

from __future__ import annotations

from typing import Callable, Tuple

import optax
from flax import traverse_util


def onecycle(peak_lr: float, total_steps: int, div_factor: float = 25.0,
             final_div_factor: float = 10000.0,
             pct_start: float = 0.3) -> optax.Schedule:
    """Cosine-annealed one-cycle LR (torch OneCycleLR defaults)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=peak_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor)


def _adamw(schedule, weight_decay: float) -> optax.GradientTransformation:
    return optax.adamw(learning_rate=schedule, weight_decay=weight_decay)


# Elementwise pre-clip before the global-norm clip: with a pathological
# early-training loss, squaring gradients for the global norm can overflow
# f32 to inf, which would turn the clip scale into 0/NaN and poison Adam's
# second moment forever. Capping elements at 1e6 bounds the global norm far
# below overflow while never touching healthy gradients.
_PRE_CLIP = 1e6


def _clip(grad_clip: float) -> optax.GradientTransformation:
    return optax.chain(optax.clip(_PRE_CLIP),
                       optax.clip_by_global_norm(grad_clip))


def _label_params(params, label_fn: Callable[[Tuple[str, ...]], str]):
    flat = traverse_util.flatten_dict(params)
    labels = {path: label_fn(path) for path in flat}
    return traverse_util.unflatten_dict(labels)


def make_dnet_optimizer(params, lr: float, total_steps: int,
                        weight_decay: float = 0.01, grad_clip: float = 1.0,
                        same_lr: bool = False,
                        div_factor: float = 25.0,
                        final_div_factor: float = 10000.0,
                        freeze_encoder: bool = False):
    """Two LR groups: encoder at lr/10, decoder/heads at lr
    (train_DNet.py:48-53). With ``freeze_encoder`` (AdaBins_fix,
    DNET.py:37-48) the encoder receives no updates at all."""
    def label(path):
        if "encoder" in path:
            return "frozen" if freeze_encoder else "encoder"
        return "rest"

    sched_full = onecycle(lr, total_steps, div_factor, final_div_factor)
    sched_enc = onecycle(lr if same_lr else lr / 10, total_steps,
                         div_factor, final_div_factor)
    tx = optax.multi_transform(
        {"encoder": _adamw(sched_enc, weight_decay),
         "rest": _adamw(sched_full, weight_decay),
         "frozen": optax.set_to_zero()},
        _label_params(params, label))
    return optax.chain(_clip(grad_clip), tx)


def make_fnet_optimizer(params, lr: float, total_steps: int,
                        weight_decay: float = 0.01, grad_clip: float = 1.0,
                        div_factor: float = 25.0,
                        final_div_factor: float = 10000.0):
    """Single group AdamW + OneCycle (train_FNet.py:45-48)."""
    sched = onecycle(lr, total_steps, div_factor, final_div_factor)
    return optax.chain(_clip(grad_clip), _adamw(sched, weight_decay))


def make_magnet_optimizer(params, lr: float, total_steps: int,
                          weight_decay: float = 0.01,
                          grad_clip: float = 1.0,
                          div_factor: float = 25.0,
                          final_div_factor: float = 10000.0):
    """Trainable: g_net + mask_head only; d_net/f_net frozen
    (MAGNET.py:82-92, train_MaGNet.py:230-233)."""
    def label(path):
        return "frozen" if path[0] in ("d_net", "f_net") else "train"

    sched = onecycle(lr, total_steps, div_factor, final_div_factor)
    tx = optax.multi_transform(
        {"train": _adamw(sched, weight_decay),
         "frozen": optax.set_to_zero()},
        _label_params(params, label))
    return optax.chain(_clip(grad_clip), tx)

"""Optimizers and schedules (optax).

Mirrors the reference training recipe (train_DNet.py:44-57,96-101):
AdamW (wd 0.01, peak lr 3.57e-4), OneCycle LR stepped per iteration
(div_factor 25, final_div_factor 1e4), global grad-norm clip 1.0. The
encoder trains at lr/10 unless ``same_lr`` (train_DNet.py:48-53).

Like torch OneCycleLR (cycle_momentum=True default), Adam beta1 cycles
0.95 -> 0.85 -> 0.95 in anti-phase with the LR (cosine annealing, pct_start
0.3) via ``optax.inject_hyperparams``; pass ``beta1_cycle=False`` for a
fixed beta1=0.9. The reference's CUDA GradScaler (train_DNet.py:62) has no
TPU equivalent: bf16 keeps f32's exponent range.

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
    """Cosine-annealed one-cycle LR (torch OneCycleLR defaults).

    transition_steps is floored at 4: optax's piecewise interpolation
    truncates the warmup boundary to int, so pct_start * total < 1 makes a
    zero-length segment whose 0/0 turns the whole schedule — and then
    every parameter — NaN. Only reachable in toy runs (total <= 3)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 4),
        peak_value=peak_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor)


def onecycle_beta1(total_steps: int, pct_start: float = 0.3,
                   base_momentum: float = 0.85,
                   max_momentum: float = 0.95) -> optax.Schedule:
    """torch OneCycleLR's momentum cycle (cycle_momentum=True defaults):
    beta1 anneals max -> base over the LR warmup and base -> max over the
    rest, cosine in both phases, anti-phase with the LR."""
    import jax.numpy as jnp

    up_steps = float(max(pct_start * max(total_steps, 1) - 1, 1))
    down_steps = float(max((max(total_steps, 1) - 1) - up_steps, 1))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        def cos_anneal(start, end, pct):
            pct = jnp.clip(pct, 0.0, 1.0)
            return end + (start - end) / 2.0 * (1 + jnp.cos(jnp.pi * pct))

        up = cos_anneal(max_momentum, base_momentum, step / up_steps)
        down = cos_anneal(base_momentum, max_momentum,
                          (step - up_steps) / down_steps)
        return jnp.where(step <= up_steps, up, down)

    return schedule


def _adamw(schedule, weight_decay: float,
           b1=0.9) -> optax.GradientTransformation:
    if callable(b1):
        return optax.inject_hyperparams(optax.adamw)(
            learning_rate=schedule, b1=b1, weight_decay=weight_decay)
    return optax.adamw(learning_rate=schedule, b1=b1,
                       weight_decay=weight_decay)


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
                        freeze_encoder: bool = False,
                        beta1_cycle: bool = True):
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
    b1 = onecycle_beta1(total_steps) if beta1_cycle else 0.9
    tx = optax.multi_transform(
        {"encoder": _adamw(sched_enc, weight_decay, b1),
         "rest": _adamw(sched_full, weight_decay, b1),
         "frozen": optax.set_to_zero()},
        _label_params(params, label))
    return optax.chain(_clip(grad_clip), tx)


def make_fnet_optimizer(params, lr: float, total_steps: int,
                        weight_decay: float = 0.01, grad_clip: float = 1.0,
                        div_factor: float = 25.0,
                        final_div_factor: float = 10000.0,
                        beta1_cycle: bool = True):
    """Single group AdamW + OneCycle (train_FNet.py:45-48)."""
    sched = onecycle(lr, total_steps, div_factor, final_div_factor)
    b1 = onecycle_beta1(total_steps) if beta1_cycle else 0.9
    return optax.chain(_clip(grad_clip), _adamw(sched, weight_decay, b1))


def make_magnet_optimizer(params, lr: float, total_steps: int,
                          weight_decay: float = 0.01,
                          grad_clip: float = 1.0,
                          div_factor: float = 25.0,
                          final_div_factor: float = 10000.0,
                          beta1_cycle: bool = True):
    """Trainable: g_net + mask_head only; d_net/f_net frozen
    (MAGNET.py:82-92, train_MaGNet.py:230-233)."""
    def label(path):
        return "frozen" if path[0] in ("d_net", "f_net") else "train"

    sched = onecycle(lr, total_steps, div_factor, final_div_factor)
    b1 = onecycle_beta1(total_steps) if beta1_cycle else 0.9
    tx = optax.multi_transform(
        {"train": _adamw(sched, weight_decay, b1),
         "frozen": optax.set_to_zero()},
        _label_params(params, label))
    return optax.chain(_clip(grad_clip), tx)

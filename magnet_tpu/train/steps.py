"""Jitted train/eval steps for the three training stages.

The reference's per-iteration loop (zero_grad -> forward -> loss -> AMP
backward -> unscale -> clip -> step -> scheduler; train_DNet.py:74-101) maps
to a single donated, jitted step: forward + loss + grad + clipped AdamW
update, with BatchNorm batch statistics updated in the same program.
Cross-replica gradient averaging and SyncBN both fall out of SPMD: inputs
are sharded on the batch axis of one mesh and XLA inserts the collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from magnet_tpu.core.dtypes import cast_floating
from magnet_tpu.train import losses


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jnp.ndarray

    @classmethod
    def create(cls, variables, tx, seed: int = 0):
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params),
                   rng=jax.random.PRNGKey(seed))


def _apply_updates(state: TrainState, grads, tx) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt)


def make_dnet_train_step(model, tx, max_depth: float, min_depth: float,
                         compute_dtype=jnp.float32):
    """batch: img (B,H,W,3), depth (B,H,W). GT clamping as in
    train_DNet.py:81-82: depth > max -> 0, mask = depth > min.
    With compute_dtype=bf16, master params stay f32 and the cast happens
    inside loss_fn (grads flow through the cast back to f32)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        gt = batch["depth"]
        gt = jnp.where(gt > max_depth, 0.0, gt)
        mask = gt > min_depth
        rng, step_rng = jax.random.split(state.rng)
        state = state.replace(rng=rng)

        def loss_fn(params):
            cparams = cast_floating(params, compute_dtype)
            out, updates = model.apply(
                {"params": cparams, "batch_stats": state.batch_stats},
                batch["img"].astype(compute_dtype), train=True,
                mutable=["batch_stats"], rngs={"droppath": step_rng})
            loss = losses.dnet_loss(out, gt, mask)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = _apply_updates(state, grads, tx)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss}

    return step


def make_fnet_train_step(model, tx, d_center, max_depth: float,
                         min_depth: float, compute_dtype=jnp.float32):
    """batch: ref/src imgs + geometry; GT nearest-downsampled to dpv res
    on the host. Loss: L1 on soft-argmax depth (train_FNet.py:96-106)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch):
        gt = batch["depth_dpv"]
        gt = jnp.where(gt > max_depth, 0.0, gt)
        mask = gt > min_depth

        def loss_fn(params):
            cparams = cast_floating(params, compute_dtype)
            cv, updates = model.apply(
                {"params": cparams, "batch_stats": state.batch_stats},
                batch["ref_img"].astype(compute_dtype),
                batch["src_imgs"].astype(compute_dtype), batch["R"],
                batch["t"], batch["is_valid"], batch["intM"],
                batch["rays2d"], jnp.asarray(d_center), train=True,
                mutable=["batch_stats"])
            pred = losses.soft_argmax_depth(cv, jnp.asarray(d_center))
            return losses.fnet_l1_loss(pred, gt, mask), \
                updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = _apply_updates(state, grads, tx)
        state = state.replace(batch_stats=new_stats)
        return state, {"loss": loss}

    return step


def magnet_batch_loss(model, params, batch_stats, batch, gamma: float,
                      max_depth: float, min_depth: float, n_iters: int,
                      compute_dtype=jnp.float32):
    """The MaGNet-stage training loss of one batch (GT clamp + forward +
    gamma-weighted NLL) — the single source of truth shared by the train
    step and the dryrun's sharded-vs-single equivalence check."""
    gt = batch["depth"]
    gt = jnp.where(gt > max_depth, 0.0, gt)
    mask = gt > min_depth
    cparams = cast_floating(params, compute_dtype)
    preds = model.apply(
        {"params": cparams, "batch_stats": batch_stats},
        batch["ref_img"].astype(compute_dtype),
        batch["src_imgs"].astype(compute_dtype), batch["R"],
        batch["t"], batch["is_valid"], batch["intM"],
        batch["rays2d"], train=True, n_iters=n_iters)
    return losses.magnet_loss(preds, gt, mask, gamma)


def make_magnet_loss_fn(model, gamma: float, max_depth: float,
                        min_depth: float, n_iters: int,
                        compute_dtype=jnp.float32):
    """Jitted forward-only batch loss (no grads/optimizer): cheap to
    compile, numerically identical to the loss the train step reports."""

    @jax.jit
    def loss_fn(params, batch_stats, batch):
        return magnet_batch_loss(model, params, batch_stats, batch,
                                 gamma, max_depth, min_depth, n_iters,
                                 compute_dtype)
    return loss_fn


def make_magnet_train_step(model, tx, gamma: float, max_depth: float,
                           min_depth: float, n_iters: int,
                           compute_dtype=jnp.float32):
    """Full-pipeline stage: only g_net/mask_head receive gradients (the
    optimizer zeroes the rest; the model stop-gradients the frozen
    backbones). D-Net/F-Net run in eval mode inside the model, matching
    the reference's .eval() freeze — so no batch_stats mutation here."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch):
        def loss_fn(params):
            return magnet_batch_loss(model, params, state.batch_stats,
                                     batch, gamma, max_depth, min_depth,
                                     n_iters, compute_dtype)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = _apply_updates(state, grads, tx)
        return state, {"loss": loss}

    return step


def make_dnet_eval_fn(model):
    @jax.jit
    def forward(state: TrainState, img):
        return model.apply({"params": state.params,
                            "batch_stats": state.batch_stats}, img,
                           train=False)
    return forward


def make_magnet_eval_fn(model, n_iters: int, return_all: bool = False):
    """Jitted MaGNet inference. Returns the final upsampled (mu, sigma)
    map; with ``return_all`` the full per-iteration list — the reference
    visualizes EVERY refinement iteration during training
    (utils/utils.py:305-332), so train_MaGNet's visualize path needs the
    list while validation wants only the last."""
    @jax.jit
    def forward(state: TrainState, batch):
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["ref_img"], batch["src_imgs"], batch["R"], batch["t"],
            batch["is_valid"], batch["intM"], batch["rays2d"],
            train=False, n_iters=n_iters)
        return preds if return_all else preds[-1]
    return forward

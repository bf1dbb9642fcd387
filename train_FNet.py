#!/usr/bin/env python
"""F-Net training entry point (stage 2 of 3).

Same CLI surface as the reference train_FNet.py. Trains the PSM-Net
matching features through the fixed 80-plane SID sweep cost volume with an
L1 loss on the soft-argmax depth (train_FNet.py:55-106).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.core import config, mesh as mesh_lib
from magnet_tpu.data import make_multiview_loader
from magnet_tpu.eval import harness, metrics
from magnet_tpu.models import build
from magnet_tpu.models.magnet import MagnetF, sid_depth_centers
from magnet_tpu.train import checkpoint, losses, optim, steps
from magnet_tpu.utils import visualize
from magnet_tpu.utils.profiling import ProfileWindow, StepTimer

_TRAIN_MODES = {"scannet": "train", "kitti_eigen": "eigen_train",
                "kitti_official": "official_train", "synthetic": "train"}
_VAL_MODES = {"scannet": "long_test", "kitti_eigen": "eigen_test",
              "kitti_official": "official_test", "synthetic": "test"}


def _batch_to_device(mesh, batch, dpv_hw):
    """Shard the multi-view batch; GT is nearest-downsampled to dpv
    resolution on host (train_FNet.py:98)."""
    h, w = dpv_hw
    d = batch["depth"]
    ry, rx = d.shape[1] // h, d.shape[2] // w
    depth_dpv = d[:, ::ry, ::rx][:, :h, :w]
    dev = {k: batch[k] for k in ("ref_img", "src_imgs", "R", "t",
                                 "is_valid", "intM", "rays2d")}
    dev["depth_dpv"] = depth_dpv
    return mesh_lib.shard_batch(mesh, dev)


def main():
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.distributed import maybe_initialize_distributed
    # Multi-host SPMD (no-op unless MAGNET_TPU_DIST=1): must run before
    # any jax.devices() use so the mesh spans every host's chips and the
    # loaders' process_index epoch sharding sees the true process count.
    maybe_initialize_distributed()
    enable_compilation_cache()
    args = config.parse_args(config.build_train_fnet_parser())
    args = config.setup_exp_dirs(args, kind="train")
    config.save_args(args, f"{args.exp_log_dir}/params.txt")

    mesh = mesh_lib.mesh_from_args(args)
    # Single-device training routes the fixed-sweep forward through the
    # batched Pallas cost-volume kernels (ops/costvolume.py
    # _sweep_pre_cost_impl); same engagement policy as train_MaGNet.
    from magnet_tpu.ops import costvolume
    costvolume.set_batched_kernel_default(mesh.size == 1)
    train_loader = make_multiview_loader(args,
                                         _TRAIN_MODES[args.dataset_name])
    val_loader = make_multiview_loader(args, _VAL_MODES[args.dataset_name])

    d_center = sid_depth_centers(args.min_depth, args.max_depth,
                                 args.FNET_num_depth_bins)

    model = MagnetF(fnet_feature_dim=args.FNET_feature_dim,
                    remat=getattr(args, "remat", False))
    V = args.MAGNET_num_source_views
    h, w = args.input_height, args.input_width
    hh, ww = args.dpv_height, args.dpv_width
    variables = model.init(
        jax.random.PRNGKey(args.seed), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1, V, h, w, 3)), jnp.zeros((1, V, 3, 3)),
        jnp.zeros((1, V, 3)), jnp.ones((1, V)), jnp.eye(3)[None],
        jnp.zeros((1, 3, hh * ww)), jnp.asarray(d_center))
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree.leaves(variables["params"]))
    print(f"Number of model parameters: {int(n_params)}")

    total_steps = len(train_loader) * args.n_epochs
    tx = optim.make_fnet_optimizer(
        variables["params"], lr=args.lr, total_steps=total_steps,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        div_factor=args.div_factor,
        final_div_factor=args.final_div_factor)

    state = steps.TrainState.create(variables, tx, seed=args.seed)
    if getattr(args, "resume_ckpt", ""):
        state = checkpoint.restore(args.resume_ckpt, state)
        print(f"resumed from step {int(state.step)}")
    state = mesh_lib.replicate(mesh, state)

    from magnet_tpu.core import dtypes
    step_fn = steps.make_fnet_train_step(
        model, tx, d_center, args.max_depth, args.min_depth,
        compute_dtype=dtypes.resolve(args.compute_dtype))

    @jax.jit
    def vis_forward(state, batch):
        cv = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         batch["ref_img"], batch["src_imgs"], batch["R"],
                         batch["t"], batch["is_valid"], batch["intM"],
                         batch["rays2d"], jnp.asarray(d_center),
                         train=False)
        return losses.soft_argmax_depth(cv, jnp.asarray(d_center))

    def run_validation(state):
        """12-metric validation table -> eval_acc.txt, the reference
        protocol (train_FNet.py:126-139,148-186)."""
        return harness.evaluate_fnet(
            lambda b: vis_forward(state, {k: b[k] for k in
                                          ("ref_img", "src_imgs", "R", "t",
                                           "is_valid", "intM", "rays2d")}),
            val_loader, args, progress=False)

    total_iter = 0
    t0 = time.time()
    prof = ProfileWindow(args.profile_dir)
    timer = StepTimer()
    for epoch in range(args.n_epochs):
        for raw_batch in train_loader:
            batch = _batch_to_device(mesh, raw_batch, (hh, ww))
            state, m = step_fn(state, batch)
            prof.tick()
            sps = timer.tick()
            total_iter += args.batch_size

            if total_iter % (args.log_every * args.batch_size) < \
                    args.batch_size:
                print(f"epoch {epoch + 1}/{args.n_epochs} iter "
                      f"{total_iter} loss {float(m['loss']):.5f} "
                      f"({time.time() - t0:.1f}s, {sps:.2f} steps/s)",
                      flush=True)

            if total_iter % args.visualize_every < args.batch_size:
                pred = vis_forward(state, jax.tree.map(
                    lambda x: x[:1], batch))
                visualize.visualize_fnet(args, raw_batch["ref_img"][:1],
                                         raw_batch["depth"][:1], pred,
                                         total_iter)

            if total_iter % args.validate_every < args.batch_size:
                mts = run_validation(state)
                metrics.log_metrics(args.eval_acc_txt, mts,
                                    f"total_iter: {total_iter}")
                checkpoint.save(args.exp_model_dir, state, total_iter)

    mts = run_validation(state)
    metrics.log_metrics(args.eval_acc_txt, mts, f"total_iter: {total_iter}")
    checkpoint.save(args.exp_model_dir, state, total_iter)


if __name__ == "__main__":
    main()

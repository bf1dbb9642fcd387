#!/usr/bin/env python
"""MaGNet training entry point (stage 3 of 3).

Same CLI surface as the reference train_MaGNet.py. D-Net and F-Net are
loaded from their stage checkpoints and frozen (both by stop_gradient in
the model and by zeroed optimizer updates); only G-Net and the upsampling
mask head train, with the gamma-weighted sequence NLL
(train_MaGNet.py:19-129, MAGNET.py:78-118).
"""

import time

import jax
import numpy as np

from magnet_tpu.core import config, mesh as mesh_lib
from magnet_tpu.data import make_multiview_loader
from magnet_tpu.eval import harness, metrics
from magnet_tpu.models import build
from magnet_tpu.train import checkpoint, optim, steps
from magnet_tpu.utils import visualize
from magnet_tpu.utils.profiling import ProfileWindow, StepTimer

_TRAIN_MODES = {"scannet": "train", "kitti_eigen": "eigen_train",
                "kitti_official": "official_train", "synthetic": "train"}
_VAL_MODES = {"scannet": "long_test", "kitti_eigen": "eigen_test",
              "kitti_official": "official_test", "synthetic": "test"}


def _device_batch(mesh, batch):
    dev = {k: batch[k] for k in ("ref_img", "src_imgs", "R", "t",
                                 "is_valid", "intM", "rays2d", "depth")}
    return mesh_lib.shard_batch(mesh, dev)


def main():
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.distributed import maybe_initialize_distributed
    # Multi-host SPMD (no-op unless MAGNET_TPU_DIST=1): must run before
    # any jax.devices() use so the mesh spans every host's chips and the
    # loaders' process_index epoch sharding sees the true process count.
    maybe_initialize_distributed()
    enable_compilation_cache()
    args = config.parse_args(config.build_train_magnet_parser())
    args = config.setup_exp_dirs(args, kind="train")
    config.save_args(args, f"{args.exp_log_dir}/params.txt")

    mesh = mesh_lib.mesh_from_args(args)
    # Single-device training may run the batched Pallas cost volume
    # inside the jitted step (+21% step throughput, scripts/bench_train.py);
    # on a multi-device GSPMD mesh it would force replication, so only
    # declare it safe when the mesh is one device.
    from magnet_tpu.ops import costvolume
    costvolume.set_batched_kernel_default(mesh.size == 1)
    train_loader = make_multiview_loader(args,
                                         _TRAIN_MODES[args.dataset_name])
    val_loader = make_multiview_loader(args, _VAL_MODES[args.dataset_name])

    model, variables = build.build_magnet(args)
    print(f"loading DNET... {args.DNET_ckpt}")
    print(f"loading FNET... {args.FNET_ckpt}")
    variables = build.load_magnet_checkpoints(variables, args)
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree.leaves(variables["params"]))
    print(f"Number of model parameters: {int(n_params)}")

    total_steps = len(train_loader) * args.n_epochs
    tx = optim.make_magnet_optimizer(
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
    step_fn = steps.make_magnet_train_step(
        model, tx, gamma=args.loss_gamma, max_depth=args.max_depth,
        min_depth=args.min_depth, n_iters=args.MAGNET_num_train_iter,
        compute_dtype=dtypes.resolve(args.compute_dtype))
    eval_fn = steps.make_magnet_eval_fn(model,
                                        n_iters=args.MAGNET_num_test_iter)
    # The reference dumps pred/error/stdev for EVERY refinement iteration
    # of the train forward (utils/utils.py:305-332, train_MaGNet.py:106-107)
    # — a separate jitted fn returning the full list, at train iteration
    # count.
    viz_fn = steps.make_magnet_eval_fn(model,
                                       n_iters=args.MAGNET_num_train_iter,
                                       return_all=True)

    def run_validation(state):
        return harness.evaluate_magnet(
            lambda b: eval_fn(state, {k: b[k] for k in
                                      ("ref_img", "src_imgs", "R", "t",
                                       "is_valid", "intM", "rays2d")}),
            val_loader, args, progress=False)

    total_iter = 0
    t0 = time.time()
    prof = ProfileWindow(args.profile_dir)
    timer = StepTimer()
    for epoch in range(args.n_epochs):
        for raw_batch in train_loader:
            batch = _device_batch(mesh, raw_batch)
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
                preds = viz_fn(state, jax.tree.map(lambda x: x[:1], {
                    k: batch[k] for k in ("ref_img", "src_imgs", "R", "t",
                                          "is_valid", "intM", "rays2d")}))
                visualize.visualize_magnet(args, raw_batch["ref_img"][:1],
                                           raw_batch["depth"][:1], preds,
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

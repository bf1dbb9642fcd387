#!/usr/bin/env python
"""D-Net training entry point (stage 1 of 3).

Same CLI surface as the reference train_DNet.py: ``python train_DNet.py
train_scripts/dnet/<dataset>.txt``. TPU-native execution: a single
controller jits one train step over a data-parallel mesh (the reference's
mp.spawn/DDP/SyncBN scaffold, train_DNet.py:180-212,298-324, is replaced
by sharding annotations — gradient psum and global batch stats fall out of
SPMD).
"""

import time

import jax
import numpy as np

from magnet_tpu.core import config, mesh as mesh_lib
from magnet_tpu.data import make_singleview_loader
from magnet_tpu.eval import harness, metrics
from magnet_tpu.models import build
from magnet_tpu.train import checkpoint, optim, steps
from magnet_tpu.utils import visualize
from magnet_tpu.utils.profiling import ProfileWindow, StepTimer

_TRAIN_MODES = {"scannet": "train", "kitti_eigen": "eigen_train",
                "kitti_official": "official_train", "synthetic": "train"}
_VAL_MODES = {"scannet": "long_test", "kitti_eigen": "eigen_test",
              "kitti_official": "official_test", "synthetic": "test"}


def main():
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.distributed import maybe_initialize_distributed
    # Multi-host SPMD (no-op unless MAGNET_TPU_DIST=1): must run before
    # any jax.devices() use so the mesh spans every host's chips and the
    # loaders' process_index epoch sharding sees the true process count.
    maybe_initialize_distributed()
    enable_compilation_cache()
    args = config.parse_args(config.build_train_dnet_parser())
    args = config.setup_exp_dirs(args, kind="train")
    config.save_args(args, f"{args.exp_log_dir}/params.txt")

    mesh = mesh_lib.mesh_from_args(args)
    print(f"devices: {mesh.devices.size} ({jax.devices()[0].platform})")

    train_loader = make_singleview_loader(args,
                                          _TRAIN_MODES[args.dataset_name])
    val_loader = make_singleview_loader(args, _VAL_MODES[args.dataset_name])

    model, variables = build.build_dnet(
        args, init_hw=(args.crop_height, args.crop_width))
    n_params = sum(np.prod(x.shape) for x in
                   jax.tree.leaves(variables["params"]))
    print(f"Number of model parameters: {int(n_params)}")

    total_steps = len(train_loader) * args.n_epochs
    tx = optim.make_dnet_optimizer(
        variables["params"], lr=args.lr, total_steps=total_steps,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
        same_lr=args.same_lr, div_factor=args.div_factor,
        final_div_factor=args.final_div_factor,
        freeze_encoder=args.DNET_fix_encoder_weights == "AdaBins_fix")
    if args.DNET_fix_encoder_weights == "AdaBins_fix":
        # Load + freeze the AdaBins KITTI encoder (DNET.py:37-48).
        from magnet_tpu.compat import torch_loader
        sd = torch_loader.load_state_dict("./ckpts/AdaBins_kitti_encoder.pt")
        variables = torch_loader.convert_adabins_encoder(sd, variables)
    elif getattr(args, "encoder_ckpt", ""):
        # ImageNet-pretrained encoder init (trainable): the reference gets
        # this implicitly from torch.hub pretrained=True
        # (D_dense_depth.py:10-11); here the hub state dict is a file.
        from magnet_tpu.compat import torch_loader
        sd = torch_loader.load_state_dict(args.encoder_ckpt)
        variables = torch_loader.convert_hub_encoder(sd, variables)
        print(f"encoder initialized from {args.encoder_ckpt}")

    state = steps.TrainState.create(variables, tx,
                                    seed=getattr(args, "seed", 0))
    if getattr(args, "resume_ckpt", ""):
        state = checkpoint.restore(args.resume_ckpt, state)
        print(f"resumed from step {int(state.step)}")
    state = mesh_lib.replicate(mesh, state)

    from magnet_tpu.core import dtypes
    step_fn = steps.make_dnet_train_step(
        model, tx, args.max_depth, args.min_depth,
        compute_dtype=dtypes.resolve(args.compute_dtype))
    eval_model, _ = build.build_dnet(args)   # full-resolution graph
    eval_fwd = steps.make_dnet_eval_fn(eval_model)
    vis_fwd = steps.make_dnet_eval_fn(model)

    def run_validation(state):
        return harness.evaluate_dnet(
            lambda img: eval_fwd(state, img), val_loader, args,
            progress=False)

    total_iter = 0
    t0 = time.time()
    prof = ProfileWindow(args.profile_dir)
    timer = StepTimer()
    for epoch in range(args.n_epochs):
        for batch in train_loader:
            batch = mesh_lib.shard_batch(
                mesh, {"img": batch["img"], "depth": batch["depth"]})
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
                out = vis_fwd(state, batch["img"][:1])
                visualize.visualize_dnet(args, batch["img"][:1],
                                         batch["depth"][:1], out,
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

#!/usr/bin/env python
"""MaGNet evaluation entry point (primary eval entry).

Same CLI surface as the reference test_MaGNet.py: ``python test_MaGNet.py
test_scripts/magnet/<dataset>.txt``. Builds the full pipeline from
DNET/FNET/MAGNET checkpoints, evaluates per image, logs the metric table.
"""

import jax
import jax.numpy as jnp

from magnet_tpu.core import config, dtypes
from magnet_tpu.data import make_multiview_loader
from magnet_tpu.eval import harness, metrics
from magnet_tpu.models import build

_TEST_MODES = {"scannet": "long_test", "7scenes": "test",
               "kitti_eigen": "eigen_test",
               "kitti_official": "official_test",
               "synthetic": "test"}


def main():
    from magnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    args = config.parse_args(config.build_test_magnet_parser())
    args = config.setup_exp_dirs(args, kind="test")
    config.save_args(args, f"{args.exp_log_dir}/params.txt")

    model, variables = build.build_magnet(args)
    print(f"loading checkpoints... D={args.DNET_ckpt} F={args.FNET_ckpt} "
          f"M={args.MAGNET_ckpt}")
    variables = build.load_magnet_checkpoints(variables, args)
    print("loading checkpoints... / done")

    n_iters = args.MAGNET_num_test_iter
    cdt = dtypes.resolve(args.compute_dtype)

    def cast_params(variables):
        return {"params": dtypes.cast_floating(variables["params"], cdt),
                "batch_stats": variables["batch_stats"]}

    cache = None
    if args.cache_features:
        from magnet_tpu.eval import streaming
        forward_batch, cache = streaming.make_streaming_forward(
            model, variables, cast_params, lambda x: x.astype(cdt),
            n_iters, max_frames=args.cache_max_frames)
    else:
        # weights as jit arguments (a closure would embed them as
        # constants of the lowered program — see test_DNet.py)
        @jax.jit
        def forward(variables, ref_img, src_imgs, R, t, is_valid, intM,
                    rays2d):
            v = cast_params(variables)
            preds = model.apply(v, ref_img.astype(cdt),
                                src_imgs.astype(cdt),
                                R, t, is_valid, intM, rays2d, train=False,
                                n_iters=n_iters)
            return preds[-1]

        def forward_batch(batch):
            return forward(variables, jnp.asarray(batch["ref_img"]),
                           jnp.asarray(batch["src_imgs"]),
                           jnp.asarray(batch["R"]), jnp.asarray(batch["t"]),
                           jnp.asarray(batch["is_valid"]),
                           jnp.asarray(batch["intM"]),
                           jnp.asarray(batch["rays2d"]))

    loader = make_multiview_loader(args, _TEST_MODES[args.dataset_name])
    m = harness.evaluate_magnet(forward_batch, loader, args)
    if cache is not None:
        print(f"feature cache: {cache.hits} hits / {cache.misses} misses "
              f"({100 * cache.hit_rate:.1f}% hit rate)")
    first_line = ("dataset: %s / d_min: %s / d_max: %s / ckpt_path: %s"
                  % (args.dataset_name, args.min_depth, args.max_depth,
                     args.MAGNET_ckpt))
    metrics.log_metrics(args.test_acc_txt, m, first_line)


if __name__ == "__main__":
    main()

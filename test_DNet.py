#!/usr/bin/env python
"""D-Net evaluation entry point.

Same CLI surface as the reference test_DNet.py: ``python test_DNet.py
test_scripts/dnet/<dataset>.txt`` (@file flag configs accepted verbatim).
Loads a checkpoint (torch .pt via the compat converter, or an orbax dir),
evaluates the 12-metric table per image, and appends to
exp/<name>/log/test_acc.txt.
"""

import jax

from magnet_tpu.core import config, dtypes
from magnet_tpu.data import make_singleview_loader
from magnet_tpu.eval import harness, metrics
from magnet_tpu.models import build

_TEST_MODES = {"scannet": "long_test", "7scenes": "long_test",
               "kitti_eigen": "eigen_test",
               "kitti_official": "official_test",
               "synthetic": "test"}


def main():
    from magnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    args = config.parse_args(config.build_test_dnet_parser())
    args = config.setup_exp_dirs(args, kind="test")
    config.save_args(args, f"{args.exp_log_dir}/params.txt")

    model, variables = build.build_dnet(args)
    print(f"loading checkpoint... {args.ckpt_path}")
    variables = build.load_dnet_checkpoint(variables, args.ckpt_path)
    print("loading checkpoint... / done")

    cdt = dtypes.resolve(args.compute_dtype)

    # Weights are jit ARGUMENTS, not closure constants: a closure would
    # embed every parameter into the lowered program (a ~580 MB module at
    # the KITTI shape — it breaks remote-compile tunnels and recompiles
    # per checkpoint).
    @jax.jit
    def forward(variables, img):
        v = {"params": dtypes.cast_floating(variables["params"], cdt),
             "batch_stats": variables["batch_stats"]}
        return model.apply(v, img.astype(cdt), train=False)

    loader = make_singleview_loader(args, _TEST_MODES[args.dataset_name])
    m = harness.evaluate_dnet(lambda img: forward(variables, img),
                              loader, args)
    first_line = ("dataset: %s / d_min: %s / d_max: %s / ckpt_path: %s"
                  % (args.dataset_name, args.min_depth, args.max_depth,
                     args.ckpt_path))
    metrics.log_metrics(args.test_acc_txt, m, first_line)


if __name__ == "__main__":
    main()

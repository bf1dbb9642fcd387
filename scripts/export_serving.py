#!/usr/bin/env python
"""Write AOT serving artifacts (serialized StableHLO) for a checkpointed
MaGNet: the monolithic forward plus the streaming encode/fuse pair.

    python scripts/export_serving.py test_scripts/magnet/scannet.txt \
        --out_dir /tmp/magnet_serving

Artifacts are architecture-bound but checkpoint-free (weights are call
arguments); run them with magnet_tpu.serve.load_exported(...).call(...).
Export on a TPU host embeds the Pallas kernels (TPU-only artifact);
export on CPU captures the portable XLA path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from magnet_tpu import serve
    from magnet_tpu.core import config
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.models import build

    enable_compilation_cache()
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out_dir", default="exported_serving")
    extra, argv = ap.parse_known_args()
    args = config.parse_args(config.build_test_magnet_parser(), argv)

    model, variables = build.build_magnet(args)
    if args.DNET_ckpt or args.MAGNET_ckpt:
        variables = build.load_magnet_checkpoints(variables, args)

    h, w, v = args.input_height, args.input_width, \
        args.MAGNET_num_source_views
    n_iters = args.MAGNET_num_test_iter
    os.makedirs(extra.out_dir, exist_ok=True)
    for name, blob in (
            ("monolithic", serve.export_monolithic(
                model, variables, img_h=h, img_w=w, n_views=v,
                n_iters=n_iters)),
            ("encode", serve.export_encode(model, variables, img_h=h,
                                           img_w=w)),
            ("fuse", serve.export_fuse(model, variables, img_h=h,
                                       img_w=w, n_views=v,
                                       n_iters=n_iters))):
        path = os.path.join(extra.out_dir, f"magnet_{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{path}: {len(blob) / 1e6:.2f} MB")


if __name__ == "__main__":
    main()

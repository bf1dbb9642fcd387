#!/usr/bin/env python
"""Benchmark: full MaGNet multi-view inference at the KITTI eval shape.

Same protocol as bench.py (in-jit timing loop, one chip) at the KITTI
configuration: 352x1216, V=2 source views, 3 refinement iterations,
batch 1 (test_scripts/magnet/kitti_eigen.txt). Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

H, W, V = 352, 1216, 2


def main(compute_dtype=jnp.bfloat16):
    from bench import example_inputs, example_variables
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.dtypes import cast_floating
    from magnet_tpu.models.magnet import Magnet

    enable_compilation_cache()
    model = Magnet(n_iters=3)
    inputs = example_inputs(img_h=H, img_w=W, n_views=V)
    variables = example_variables(model, inputs)

    def forward_n(n):
        @jax.jit
        def run(variables, ref_img, src_imgs, *rest):
            v = {"params": cast_floating(variables["params"],
                                         compute_dtype),
                 "batch_stats": variables["batch_stats"]}
            csrc = src_imgs.astype(compute_dtype)

            def body(_, carry):
                out = model.apply(v, carry, csrc, *rest,
                                  train=False)[-1]
                return carry + 0.0 * out[..., :1].astype(carry.dtype)

            return jax.lax.fori_loop(0, n, body,
                                     ref_img.astype(compute_dtype))
        return run

    run1, runN = forward_n(1), forward_n(8)
    float(run1(variables, *inputs)[0, 0, 0, 0])
    float(runN(variables, *inputs)[0, 0, 0, 0])

    def timed(run):
        t0 = time.perf_counter()
        float(run(variables, *inputs)[0, 0, 0, 0])
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(5))
    tN = min(timed(runN) for _ in range(5))
    fps = (8 - 1) / (tN - t1)

    print(json.dumps({
        "metric": "magnet_kitti_multiview_inference",
        "value": round(fps, 3),
        "unit": "frames/sec/chip (352x1216, V=2, 3 iters)",
    }))


if __name__ == "__main__":
    main()

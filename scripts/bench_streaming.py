#!/usr/bin/env python
"""Benchmark: steady-state streaming (video serving) throughput on one chip.

The monolithic protocol (bench.py) encodes ref + V neighbors every frame;
in a video each frame is re-encoded ~(V+1) times across overlapping
windows. The streaming path (magnet_tpu/eval/streaming.py) caches per-frame
trunk encodings, so steady state is ONE D/F encode of the new frame + one
fusion per output. This script times exactly that regime: the V neighbor
encodings are cache-resident constants; each timed iteration encodes one
new frame and fuses a window (same shapes as bench.py: 640x480, V=4,
3 iters, batch 1).

Prints one JSON line {metric, value, unit, plus the monolithic-equivalent
speedup for context}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import example_inputs, example_variables
from magnet_tpu.models.magnet import Magnet

# --kitti: 352x1216, V=2 (test_scripts/magnet/kitti_eigen.txt)
_SHAPES = {"scannet": (480, 640, 4), "kitti": (352, 1216, 2)}


def main(compute_dtype=jnp.bfloat16, shape="scannet"):
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.dtypes import cast_floating
    enable_compilation_cache()

    img_h, img_w, n_views = _SHAPES[shape]
    model = Magnet(n_iters=3)
    inputs = example_inputs(img_h=img_h, img_w=img_w, n_views=n_views)
    variables = example_variables(model, inputs)
    ref_img, src_imgs, R, t, valid, intM, rays2d = inputs

    cvars = {"params": cast_floating(variables["params"], compute_dtype),
             "batch_stats": variables["batch_stats"]}

    # Pre-encode the V neighbors once (cache-resident in steady state).
    V = src_imgs.shape[1]
    encode = jax.jit(lambda img: model.apply(
        cvars, img.astype(compute_dtype), train=False, method="encode"))
    src_encs = [encode(src_imgs[:, i]) for i in range(V)]
    src_g = jnp.stack([e[0][0] for e in src_encs])[None]
    src_fm = jnp.stack([e[2][0] for e in src_encs])[None]

    def forward_n(n):
        @jax.jit
        def run(cvars, ref_img, src_g, src_fm, R, t, valid, intM, rays2d):
            cref = ref_img.astype(compute_dtype)

            def body(_, carry):
                g, fd, fm = model.apply(cvars, carry, train=False,
                                        method="encode")
                pred = model.apply(cvars, g, fd, fm, src_g, src_fm,
                                   R, t, valid, intM, rays2d,
                                   train=False, method="fuse")[-1]
                # serialize iterations on device (bench.py discipline)
                return carry + 0.0 * pred[..., :1].astype(carry.dtype)

            return jax.lax.fori_loop(0, n, body, cref)
        return run

    run1, runN = forward_n(1), forward_n(8)
    args = (cvars, ref_img, src_g, src_fm, R, t, valid, intM, rays2d)
    float(run1(*args)[0, 0, 0, 0])
    float(runN(*args)[0, 0, 0, 0])

    def timed(run):
        t0 = time.perf_counter()
        float(run(*args)[0, 0, 0, 0])
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(3))
    tN = min(timed(runN) for _ in range(3))
    fps = (8 - 1) / (tN - t1)

    print(json.dumps({
        "metric": f"magnet_{shape}_streaming_inference",
        "value": round(fps, 3),
        "unit": f"frames/sec/chip ({img_w}x{img_h}, V={n_views}, 3 iters,"
                " steady-state video: 1 encode + 1 fuse per frame)",
    }))


if __name__ == "__main__":
    main(shape="kitti" if "--kitti" in sys.argv[1:] else "scannet")

#!/usr/bin/env python
"""Benchmark: full MaGNet multi-view inference throughput on one chip.

Measures frames/sec of the flagship pipeline at the reference's ScanNet
evaluation shape (640x480, V=4 source views, D=5 candidates, 3 refinement
iterations, batch 1 — test_scripts/magnet/scannet.txt), end to end: D-Net +
F-Net on all 5 frames, 3x consistency-weighted cost volume + G-Net, learned
upsampling.

Prints ONE JSON line {metric, value, unit, vs_baseline}.

vs_baseline: BASELINE.json's speed target is >=5x a PyTorch-GPU reference
that publishes no throughput numbers. The GPU anchor is derived from a
MEASUREMENT: scripts/bench_anchor.py times the reference torch pipeline on
this host's CPU (the only hardware both codebases share) and scales by a
documented CPU->GPU CNN-inference factor (see BASELINE.md "Speed anchor");
the result is recorded in bench_anchor.json and read here, so
vs_baseline = fps / (ref_gpu_fps * 5). Falls back to the recorded default
when the json is absent.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from magnet_tpu.models.magnet import Magnet

H, W, V = 480, 640, 4
# fallback = the last measured anchor (see bench_anchor.json / BASELINE.md)
DEFAULT_REF_GPU_FPS = 5.0
TARGET_MULTIPLIER = 5.0


def ref_gpu_fps() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_anchor.json")
    try:
        with open(path) as f:
            return float(json.load(f)["ref_gpu_fps"])
    except (OSError, KeyError, ValueError):
        return DEFAULT_REF_GPU_FPS


def example_inputs(batch=1, img_h=H, img_w=W, n_views=V):
    rng = np.random.RandomState(0)
    h, w = img_h // 4, img_w // 4
    fx = 0.9 * img_w / 4
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]], np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(3, -1)
    return (
        jnp.asarray(rng.rand(batch, img_h, img_w, 3), jnp.float32),
        jnp.asarray(rng.rand(batch, n_views, img_h, img_w, 3), jnp.float32),
        jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                            (batch, n_views, 1, 1))),
        jnp.asarray(rng.randn(batch, n_views, 3).astype(np.float32) * 0.05),
        jnp.ones((batch, n_views), jnp.float32),
        jnp.asarray(np.tile(K, (batch, 1, 1))),
        jnp.asarray(np.tile(rays, (batch, 1, 1))),
    )


def realistic_depth_init(variables):
    """Pin the Gaussian-head outputs so the measured regime matches
    deployment: mu = 2 m (positive metric depth), sigma ~ 0.2 m.

    Freshly-initialized weights predict garbage depth — random-init
    activations reaching the depth head swamp any bias nudge, so the
    Gaussian-sampled candidate depths go near-zero/negative/huge:
    geometry no trained network ever produces (depth is positive by
    construction), which sends the plane-sweep projections to degenerate
    coordinates (and, with the round-3 exactness guard, would unfairly
    trigger its XLA fallback). Zeroing the final depth-head conv KERNEL
    and setting its bias makes the output exactly (mu=2, sigma-param=-3
    -> sigma = sqrt(elu(-3)+1) ~ 0.22, DNET.py:62-67 activation); zeroing
    G-Net's final conv keeps the refinement residuals at (0, 0) so every
    iteration stays in that regime. The compute graph is unchanged — only
    the data regime the timing sees becomes the deployed one."""
    from flax.core import unfreeze
    v = unfreeze(variables)
    head = v["params"]["d_net"]["d_net"]["depth_head"]["conv2"]["conv"]
    assert head["bias"].shape == (2,), head["bias"].shape
    head["kernel"] = jnp.zeros_like(head["kernel"])
    head["bias"] = jnp.asarray([2.0, -3.0], head["bias"].dtype)
    gnet = v["params"]["g_net"]["conv3"]["conv"]
    assert gnet["bias"].shape == (2,), gnet["bias"].shape
    gnet["kernel"] = jnp.zeros_like(gnet["kernel"])
    gnet["bias"] = jnp.zeros_like(gnet["bias"])
    return v


def example_variables(model, inputs):
    """Init + realistic-regime depth biases (shared with the profiler)."""
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    return realistic_depth_init(variables)


def main(compute_dtype=jnp.bfloat16):
    from magnet_tpu.core.dtypes import cast_floating

    # Persistent compilation cache: repeated bench runs in one container
    # skip the ~10-15 min cold compile through the TPU tunnel.
    from magnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    model = Magnet(n_iters=3)
    inputs = example_inputs()
    variables = example_variables(model, inputs)

    def cast_in(variables, ref_img, src_imgs, *rest):
        # bf16 conv compute; geometry tensors stay f32 (recast internally)
        v = {"params": cast_floating(variables["params"], compute_dtype),
             "batch_stats": variables["batch_stats"]}
        return (v, ref_img.astype(compute_dtype),
                src_imgs.astype(compute_dtype)) + rest

    # The timing loop lives INSIDE jit: N data-dependent forwards per
    # dispatch, so per-call host->device dispatch latency (large behind a
    # TPU tunnel, where block_until_ready can also return early) cannot
    # pollute the measurement. fps = N / (t_N - t_0 overhead), with the
    # one-iteration run subtracted as the dispatch/transfer baseline.
    # The trip count n is a TRACED scalar (fori_loop lowers to a device
    # while_loop), so n=1 and n=8 share ONE compiled program — cold-start
    # compiles half of what two static-unroll variants did (BENCH_r04's
    # driver timeout was pure compile time, VERDICT r4 weak #1).
    @jax.jit
    def run(variables, n, ref_img, *rest):
        cvars, cref, csrc, *crest = cast_in(variables, ref_img, *rest)
        def body(_, carry):
            out = model.apply(cvars, carry, csrc, *crest,
                              train=False)[-1]
            # next input depends on this output -> serialized on device
            return carry + 0.0 * out[..., :1].astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, cref)

    n1, nN = jnp.int32(1), jnp.int32(8)
    float(run(variables, n1, *inputs)[0, 0, 0, 0])  # compile + warmup
    float(run(variables, nN, *inputs)[0, 0, 0, 0])

    def timed(n):
        t0 = time.perf_counter()
        # forces full execution
        float(run(variables, n, *inputs)[0, 0, 0, 0])
        return time.perf_counter() - t0

    # min over 5 reps: process-to-process tunnel load adds up to ~5%
    # run-to-run spread; the min is the stable estimator of device time.
    t1 = min(timed(n1) for _ in range(5))
    tN = min(timed(nN) for _ in range(5))
    dt = (tN - t1) / (8 - 1)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "magnet_scannet_multiview_inference",
        "value": round(fps, 3),
        "unit": "frames/sec/chip (640x480, V=4, 3 iters)",
        "vs_baseline": round(
            fps / (ref_gpu_fps() * TARGET_MULTIPLIER), 3),
    }))


if __name__ == "__main__":
    main()

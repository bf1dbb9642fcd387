#!/usr/bin/env python
"""Benchmark: TRAINING-step throughput on one chip, per stage.

--stage 3 (default): the flagship MaGNet stage (train_MaGNet protocol:
frozen D-Net/F-Net forwards + value_and_grad over G-Net and the mask
head + AdamW update) at the ScanNet training shape, batch 2, bf16.
--stage 1: D-Net training (train_DNet protocol: full
DenseDepth/EffNet-B5 forward+backward, NOTHING frozen — the regime where
the inference Pallas kernels never engage and XLA owns everything) at
the ScanNet crop 416x544.
--stage 2: F-Net training (train_FNet protocol: PSM-Net on 1+V frames,
80-bin plane sweep, L1 on soft-argmax depth) at the ScanNet dpv shape.

The timing loop lives inside jit — each fori iteration feeds the
updated TrainState into the next step, so the chain is serialized on
device and wall-clock dispatch latency through the TPU tunnel cannot
pollute the number (same discipline as bench.py).

Prints ONE JSON line {metric, value, unit} per invocation.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

H, W, V, B = 480, 640, 4, 2
if "--kitti" in sys.argv[1:]:
    # KITTI training shape (train_scripts/magnet/kitti_*.txt)
    H, W, V = 352, 1216, 2

STAGE = 3
if "--stage" in sys.argv[1:]:
    STAGE = int(sys.argv[sys.argv.index("--stage") + 1])


def train_batch(batch=B):
    from bench import example_inputs
    rng = np.random.RandomState(1)
    (ref_img, src_imgs, R, t, is_valid, intM, rays2d) = example_inputs(
        batch, img_h=H, img_w=W, n_views=V)
    return {
        "ref_img": ref_img, "src_imgs": src_imgs, "R": R, "t": t,
        "is_valid": is_valid, "intM": intM, "rays2d": rays2d,
        "depth": jnp.asarray(
            rng.uniform(0.5, 8.0, (batch, H, W)).astype(np.float32)),
    }


def _tame_gnet(variables):
    """Zero G-Net's output conv so the timed regime matches deployment.

    With RANDOM backbones the raw cost volume is huge and the residual
    update multiplies sigma by ~1e4 per iteration: f32 reaches ~1e32 and
    bf16 overflows to inf — a regime no trained model ever visits (the
    reference trains this stage from released D/F checkpoints,
    train_MaGNet.py). Zeroing conv3 makes every iteration the identity
    update (mu, sigma stay at the realistic init); gradients still reach
    every trained parameter, the compute graph is unchanged."""
    from flax.core import unfreeze
    v = unfreeze(variables)
    conv = v["params"]["g_net"]["conv3"]["conv"]
    conv["kernel"] = jnp.zeros_like(conv["kernel"])
    conv["bias"] = jnp.zeros_like(conv["bias"])
    return v


def _timing_harness(step_fn, make_state, batch, n_loop=4, reps=3):
    """Shared in-jit fori timing: returns seconds per step."""
    def run_n(n):
        @jax.jit
        def run(state, batch):
            def body(_, carry):
                state, _ = carry
                state, metrics = step_fn(state, batch)
                return state, metrics["loss"]
            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return run

    run1, runN = run_n(1), run_n(n_loop)

    def timed(run):
        out = run(make_state(), batch)
        float(out[1])                       # compile + warmup consume
        t0 = time.perf_counter()
        final = run(make_state(), batch)
        loss = float(final[1])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), loss
        return dt

    t1 = min(timed(run1) for _ in range(reps))
    tN = min(timed(runN) for _ in range(reps))
    return (tN - t1) / (n_loop - 1)


def main_stage1():
    """D-Net training step (train_DNet.py protocol, ScanNet crop shape,
    reference batch 16 — run at batch 4 to fit one chip comfortably;
    samples/s scales what matters). Everything trains: EffNet-B5 +
    decoder forward/backward in bf16 with f32 masters."""
    from magnet_tpu.train import optim, steps
    from magnet_tpu.models.dnet import DNet

    Hc, Wc, Bc = (352, 704, 2) if V == 2 else (416, 544, 4)
    model = DNet(output_dim=2, downsample_ratio=4, use_bn=True)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(Bc, Hc, Wc, 3).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    batch = {"img": img,
             "depth": jnp.asarray(rng.uniform(
                 0.5, 8.0, (Bc, Hc, Wc)).astype(np.float32))}
    tx = optim.make_dnet_optimizer(variables["params"], lr=1e-4,
                                   total_steps=1000)
    step_fn = steps.make_dnet_train_step(model, tx, max_depth=10.0,
                                         min_depth=1e-3,
                                         compute_dtype=jnp.bfloat16)

    def make_state():
        return steps.TrainState.create(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, tx,
            seed=0)

    # light per-step cost at this stage: more in-jit iterations so the
    # 1-vs-N delta clears the fresh-TrainState transfer noise (a 4-step
    # loop once printed 887 samples/s at the KITTI shape — pure noise)
    per_step = _timing_harness(step_fn, make_state, batch, n_loop=12,
                               reps=4)
    print(json.dumps({
        "metric": "dnet_%s_train_step" % ("kitti" if V == 2 else
                                          "scannet"),
        "value": round(Bc / per_step, 3),
        "unit": f"samples/sec/chip ({Wc}x{Hc} crop, batch {Bc}, bf16, "
                "full backward)",
    }))


def main_stage2():
    """F-Net training step (train_FNet.py protocol: PSM-Net features on
    1+V frames, 80-bin SID plane sweep, L1 on soft-argmax)."""
    from bench import example_inputs
    from magnet_tpu.models.magnet import MagnetF, sid_depth_centers
    from magnet_tpu.ops import costvolume
    from magnet_tpu.train import optim, steps

    # single-chip bench: the sweep forward rides the batched Pallas CV
    # kernels (train_FNet.py declares the same at mesh size 1)
    costvolume.set_batched_kernel_default(True)
    Bc = 2
    d_center = sid_depth_centers(1e-3, 10.0, 80)
    # --remat (the TPU extension train_FNet.py exposes) is REQUIRED at
    # this shape: batch 2 x (1+V) frames of PSM backward activations
    # alone exceed one chip's HBM without block checkpointing (measured:
    # the un-remat'd step crashes the worker at B=2, runs at B=1).
    model = MagnetF(fnet_feature_dim=64, remat=True)
    (ref_img, src_imgs, R, t, is_valid, intM, rays2d) = example_inputs(
        Bc, img_h=H, img_w=W, n_views=V)
    rng = np.random.RandomState(1)
    h, w = H // 4, W // 4
    batch = {"ref_img": ref_img, "src_imgs": src_imgs, "R": R, "t": t,
             "is_valid": is_valid, "intM": intM, "rays2d": rays2d,
             "depth_dpv": jnp.asarray(rng.uniform(
                 0.5, 8.0, (Bc, h, w)).astype(np.float32))}
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), ref_img, src_imgs, R, t, is_valid, intM,
        rays2d, jnp.asarray(d_center))
    tx = optim.make_fnet_optimizer(variables["params"], lr=1e-4,
                                   total_steps=1000)
    step_fn = steps.make_fnet_train_step(model, tx, d_center,
                                         max_depth=10.0, min_depth=1e-3,
                                         compute_dtype=jnp.bfloat16)

    def make_state():
        return steps.TrainState.create(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, tx)

    per_step = _timing_harness(step_fn, make_state, batch)
    print(json.dumps({
        "metric": "fnet_%s_train_step" % ("kitti" if V == 2 else
                                          "scannet"),
        "value": round(Bc / per_step, 3),
        "unit": f"samples/sec/chip ({W}x{H}, V={V}, 80 bins, batch "
                f"{Bc}, bf16, full backward, --remat)",
    }))


def main():
    from bench import example_variables, example_inputs
    from magnet_tpu.models.magnet import Magnet
    from magnet_tpu.ops import costvolume
    from magnet_tpu.train import optim, steps

    # Single-chip benchmark: the batched Pallas cost volume is safe and
    # is the production default at mesh size 1 (train_MaGNet.py). A/B at
    # the ScanNet shape: 26.87 off -> 32.54 samples/s/chip on (+21%);
    # MAGNET_TPU_PALLAS_CV_BATCH=0 reproduces the off leg.
    costvolume.set_batched_kernel_default(True)

    model = Magnet(n_iters=3)
    variables = _tame_gnet(example_variables(
        model, example_inputs(1, img_h=H, img_w=W, n_views=V)))
    batch = train_batch()

    tx = optim.make_magnet_optimizer(variables["params"], lr=1e-4,
                                     total_steps=1000)
    step_fn = steps.make_magnet_train_step(
        model, tx, gamma=0.8, max_depth=10.0, min_depth=1e-3, n_iters=3,
        compute_dtype=jnp.bfloat16)

    def run_n(n):
        @jax.jit
        def run(state, batch):
            def body(_, carry):
                state, _ = carry
                state, metrics = step_fn(state, batch)
                return state, metrics["loss"]
            return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))
        return run

    run1, runN = run_n(1), run_n(4)

    def timed(run):
        state = steps.TrainState.create(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, tx)
        out = run(state, batch)
        float(out[1])                       # compile + warmup consume
        state = steps.TrainState.create(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, tx)
        t0 = time.perf_counter()
        final = run(state, batch)
        loss = float(final[1])
        dt = time.perf_counter() - t0
        assert np.isfinite(loss), loss
        return dt

    # min over 3 reps each: timed() includes the fresh-TrainState host ->
    # device transfer, whose tunnel noise can otherwise swamp the
    # 1-vs-4-step difference (a single-sample run once printed 1568
    # samples/s at the KITTI shape — pure noise).
    t1 = min(timed(run1) for _ in range(3))
    tN = min(timed(runN) for _ in range(3))
    per_step = (tN - t1) / 3.0
    print(json.dumps({
        "metric": "magnet_%s_train_step" % ("kitti" if V == 2 else "scannet"),
        "value": round(B / per_step, 3),
        "unit": f"samples/sec/chip ({W}x{H}, V={V}, 3 iters, batch {B}, "
                "bf16, frozen-backbone grad)",
    }))


if __name__ == "__main__":
    from magnet_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    {1: main_stage1, 2: main_stage2, 3: main}[STAGE]()

#!/usr/bin/env python
"""Guarded end-to-end throughput over a CONTINUOUS synthetic camera
trajectory (VERDICT r4 next #5).

bench_motion.py prices motion regimes as occupancy-weighted sums of
per-rung timings measured on synthetic single-pose batches; no real
SEQUENCE had ever flowed through the guard end to end. This script
drives the production guarded forward through a smooth trajectory
(integrated angular velocity + jitter, per-regime magnitudes), with
every frame's source views taken from neighboring trajectory poses —
so escalation happens exactly where the trajectory makes it happen —
and records:

  * measured fps over the whole sequence (in-jit fori_loop over frames,
    loop-carried dependency; poses gathered per frame from a stacked
    pose tensor — dispatch latency excluded as in bench.py);
  * the ACTUAL per-frame rung choices (the same planner reductions the
    guard runs, evaluated per frame outside the timed loop);
  * the occupancy-model prediction for the SAME frames (choice-weighted
    per-rung timings from benchmarks/bench_motion_scannet.json).

Writes benchmarks/bench_sequence_<shape>.json:
  per regime {measured_fps, predicted_fps, rel_err, rung_histogram}.

Network compute is pose-independent; images are held fixed (the rung
choice depends only on poses and the predicted Gaussian, which
bench.realistic_depth_init pins to the deployed regime mu=2/sigma=0.22),
so fps differences across regimes isolate the ladder exactly as they do
in bench_motion.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# Per-frame motion magnitudes (roll/pitch/yaw deg per frame step,
# translation m per frame step) for the three regimes the occupancy
# sweep prices. "slow" ~ deliberate handheld scanning (ScanNet-like),
# "medium" ~ normal handheld, "fast" ~ quick pans.
REGIMES = {
    "slow": dict(ang=0.4, trans=0.012),
    "medium": dict(ang=1.2, trans=0.03),
    "fast": dict(ang=3.0, trans=0.08),
    # beyond-realistic magnitudes whose only purpose is to drive the
    # trajectory through the UPPER rungs, validating the pricing model
    # where it matters most (10/25 deg/frame ~ whip pans)
    "very-fast": dict(ang=10.0, trans=0.2),
    "extreme": dict(ang=25.0, trans=0.5),
}


def _rot(axis, ang):
    c, s = np.cos(ang), np.sin(ang)
    i, j, k = {0: (1, 2, 0), 1: (2, 0, 1), 2: (0, 1, 2)}[axis]
    R = np.eye(3, dtype=np.float64)
    R[i, i] = c; R[i, j] = -s
    R[j, i] = s; R[j, j] = c
    return R


def trajectory(n_frames, ang_deg, trans_m, seed=0):
    """Smooth cam-to-world pose sequence: per-step rotation = slowly
    varying angular velocity (mean ang_deg/frame split over axes) +
    20% jitter; translation likewise. Returns (R_wc (N,3,3),
    t_wc (N,3))."""
    rng = np.random.RandomState(seed)
    w = np.radians(ang_deg) * np.array([0.5, 0.7, 0.5])   # x (pitch),
    v = trans_m * np.array([0.6, 0.2, 0.8])               # y (yaw), z (roll)
    R = np.eye(3)
    t = np.zeros(3)
    Rs, ts = [R.copy()], [t.copy()]
    drift = rng.randn(3) * 0.3
    for _ in range(n_frames - 1):
        drift = 0.9 * drift + 0.1 * rng.randn(3)
        step_w = w * (1.0 + 0.2 * drift)
        step = (_rot(0, step_w[0]) @ _rot(1, step_w[1])
                @ _rot(2, step_w[2]))
        R = R @ step
        t = t + R @ (v * (1.0 + 0.2 * rng.randn(3)))
        Rs.append(R.copy()), ts.append(t.copy())
    return np.stack(Rs), np.stack(ts)


def relative_poses(R_wc, t_wc, window=(-2, -1, 1, 2)):
    """Per frame, (R, t) mapping ref-camera coords into each source
    view's camera coords: x_s = R x_r + t (ops/costvolume.py
    convention). Frames whose window leaves the sequence reuse the
    nearest valid neighbor (the loaders' fallback)."""
    N = len(R_wc)
    V = len(window)
    R = np.zeros((N, V, 3, 3), np.float32)
    t = np.zeros((N, V, 3), np.float32)
    for i in range(N):
        for vi, dw in enumerate(window):
            j = min(max(i + dw, 0), N - 1)
            if j == i:
                j = min(max(i + (1 if dw > 0 else -1), 0), N - 1)
            Rrel = R_wc[j].T @ R_wc[i]
            trel = R_wc[j].T @ (t_wc[i] - t_wc[j])
            R[i, vi] = Rrel.astype(np.float32)
            t[i, vi] = trel.astype(np.float32)
    return R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.dtypes import cast_floating
    from magnet_tpu.models.magnet import (Magnet,
                                          gaussian_sampling_offsets)
    from magnet_tpu.ops.costvolume import ladder_steps, _cv_guard_tol
    enable_compilation_cache()

    H, W, V, N = args.height, args.width, args.views, args.frames
    h, w = H // 4, W // 4
    model = Magnet(n_iters=3)
    inputs = bench.example_inputs(img_h=H, img_w=W, n_views=V)
    variables = bench.example_variables(model, inputs)
    K = np.asarray(inputs[5][0])
    rays = np.asarray(inputs[6][0])

    def cast_in(variables, ref_img, src_imgs, *rest):
        v = {"params": cast_floating(variables["params"], jnp.bfloat16),
             "batch_stats": variables["batch_stats"]}
        return (v, ref_img.astype(jnp.bfloat16),
                src_imgs.astype(jnp.bfloat16)) + rest

    @jax.jit
    def run_seq(variables, n, Rseq, tseq, ref_img, src_imgs, _R0, _t0,
                is_valid, intM, rays2d):
        cvars, cref, csrc, valid_, K_, rays_ = cast_in(
            variables, ref_img, src_imgs, is_valid, intM, rays2d)

        def body(i, carry):
            R_i = jax.lax.dynamic_index_in_dim(Rseq, i, keepdims=False)
            t_i = jax.lax.dynamic_index_in_dim(tseq, i, keepdims=False)
            out = model.apply(cvars, carry, csrc, R_i[None], t_i[None],
                              valid_, K_, rays_, train=False)[-1]
            return carry + 0.0 * out[..., :1].astype(carry.dtype)
        return jax.lax.fori_loop(0, n, body, cref)

    # Planner occupancy for the SAME frames: cheapest admitted rung per
    # (frame, iteration-sigma) with the production dvol regime.
    from magnet_tpu.kernels.costvolume_pallas import \
        cost_volume_cw_oob_fraction
    steps = ladder_steps(h, w, V, itemsize=2)
    tol = _cv_guard_tol()
    ks = gaussian_sampling_offsets(3.0, 5)
    dvol = jnp.asarray((np.full((1, h, w, 5), 2.0, np.float32)
                        + 0.22 * ks).astype(np.float32))
    valid1 = jnp.ones((1, V), jnp.float32)

    @jax.jit
    def frame_fracs(R_i, t_i):
        return jnp.stack([
            cost_volume_cw_oob_fraction(
                dvol, R_i[None], t_i[None], jnp.asarray(K)[None],
                jnp.asarray(rays)[None], valid1, band=b, pair=p,
                pair_rows=r, n_blocks=nb or 1)[0]
            for (p, b, r, nb) in ((tuple(s) + (None, 1))[:4]
                                  for s in steps)])

    def rung_names():
        names = []
        for (p, b, r, nb) in ((tuple(s) + (None, 1))[:4] for s in steps):
            kind = "pair" if p else "band"
            sfx = f"r{r}" if r else ""
            blk = f"x{nb}" if (nb or 1) > 1 else ""
            names.append(f"{kind}{b}{sfx}{blk}")
        return names + ["xla"]

    # Per-rung per-frame timings for the prediction side.
    motion_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "bench_motion_scannet.json")
    rung_times = None
    if os.path.exists(motion_path):
        with open(motion_path) as f:
            m = json.load(f)
        rung_times = {k: v["sec_per_frame"] for k, v in
                      m.get("per_rung", {}).items()}
        rung_times["xla"] = rung_times.get("xla-escalated")

    results = {}
    names = rung_names()
    for regime, cfg in REGIMES.items():
        R_wc, t_wc = trajectory(N, cfg["ang"], cfg["trans"])
        Rrel, trel = relative_poses(R_wc, t_wc)
        Rseq = jnp.asarray(Rrel)
        tseq = jnp.asarray(trel)

        # actual rung choice per frame: cheapest rung with frac <= tol
        hist = np.zeros(len(steps) + 1, np.int64)
        choices = []
        for i in range(N):
            fr = np.asarray(frame_fracs(Rseq[i], tseq[i]))
            sel = next((k for k in range(len(steps)) if fr[k] <= tol),
                       len(steps))
            hist[sel] += 1
            choices.append(sel)

        # measured fps over the sequence (subtract 1-frame baseline)
        n1, nN = jnp.int32(1), jnp.int32(N)
        float(run_seq(variables, n1, Rseq, tseq, *inputs)[0, 0, 0, 0])
        float(run_seq(variables, nN, Rseq, tseq, *inputs)[0, 0, 0, 0])

        def timed(n):
            t0 = time.perf_counter()
            float(run_seq(variables, n, Rseq, tseq,
                          *inputs)[0, 0, 0, 0])
            return time.perf_counter() - t0
        t1 = min(timed(n1) for _ in range(args.reps))
        tN = min(timed(nN) for _ in range(args.reps))
        dt = (tN - t1) / (N - 1)
        fps = 1.0 / dt

        pred = None
        if rung_times and all(n in rung_times for n in names):
            # frame 0 is excluded from the measured window (the t1
            # baseline); predict over frames 1..N-1 with each frame
            # paying its chosen rung's full-forward time. The guard
            # re-chooses per ITERATION inside the forward, but with
            # sigma pinned all 3 iterations see the same fractions —
            # the per-frame choice above is the per-iteration choice.
            ts = [rung_times[names[c]] for c in choices[1:]]
            pred = 1.0 / float(np.mean(ts))

        results[regime] = {
            "measured_fps": round(fps, 2),
            "predicted_fps": round(pred, 2) if pred else None,
            "rel_err": (round(abs(fps - pred) / pred, 4)
                        if pred else None),
            "rung_histogram": {n: int(c) for n, c in
                               zip(names, hist)},
            "ang_deg_per_frame": cfg["ang"],
            "trans_m_per_frame": cfg["trans"],
        }
        print(f"{regime:8} measured {fps:6.2f} fps   predicted "
              f"{pred if pred else float('nan'):6.2f}   "
              f"hist {dict(zip(names, hist.tolist()))}", flush=True)

    out = args.out or os.path.join(
        os.path.dirname(motion_path),
        f"bench_sequence_{'scannet' if H == 480 else f'{H}x{W}'}.json")
    with open(out, "w") as f:
        json.dump({"frames": N, "views": V, "height": H, "width": W,
                   "ladder": names, "regimes": results}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Guarded end-to-end throughput as a function of motion regime.

The per-frame exactness guard (ops/costvolume.py escalation ladder) makes
throughput motion-dependent: a frame rides the cheapest cost-volume
kernel rung whose slab coverage is exact for its motion, so fps on real
data is a mix over rungs. bench.py's headline number is measured at
near-static motion (rung 1); this script measures the OTHER rungs and
the floors, then combines them with the measured per-regime rung
occupancy (scripts/cv_motion_sweep.py --ladder) into the expected fps on
data that moves like ScanNet handheld / KITTI driving.

Method (all on one chip, in-jit timing loops, min over reps):
  1. One jitted guarded forward (the production program: all ladder
     branches compiled in). For each rung, synthesize poses — pure roll
     of increasing angle — that make the guard pick exactly that rung,
     VERIFIED with the same planning math the guard runs
     (cost_volume_cw_oob_fraction); time the identical program on each
     pose set. Network compute is pose-independent, so fps differences
     isolate the ladder branch (plan/check cascades included, exactly as
     a real escalating frame pays them).
  2. The pure-XLA cost-volume floor (MAGNET_TPU_PALLAS_CV=0), the
     "kernel disabled entirely" reference.
  3. Expected per-regime fps: E[t] = t_rung1 + sum over the 3 refinement
     iterations i and rungs r of occupancy[i][r] * (t_r - t_rung1)/3.
     Expectation is linear, so per-frame correlation between iterations
     does not bias it; iteration i's occupancy row is the sweep's
     sigma/mu ratio 0.25/0.10/0.03 (the refinement schedule).

Writes benchmarks/bench_motion_<shape>.json and prints the table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

SIG_RATIOS = (0.25, 0.10, 0.03)          # sweep rows for iterations 1..3


def _roll_poses(theta, B, V, seed=0):
    rng = np.random.RandomState(seed)
    Rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0],
                   [0, 0, 1]], np.float32)
    R = np.tile(Rz, (B, V, 1, 1)).astype(np.float32)
    t = (rng.randn(B, V, 3) * 0.05).astype(np.float32)
    return R, t


def find_rung_poses(steps, tol, H, W, V, K, rays, mu=2.0, sigma=0.22):
    """For each ladder rung (and the final XLA escalation), a roll angle
    whose coverage fractions select exactly that rung — judged by the
    SAME planner the runtime guard uses (jitted; one walk over the
    angle grid)."""
    import functools

    import jax
    import jax.numpy as jnp
    from magnet_tpu.kernels.costvolume_pallas import \
        cost_volume_cw_oob_fraction
    from magnet_tpu.models.magnet import gaussian_sampling_offsets

    ks = gaussian_sampling_offsets(3.0, 5)
    dvol = jnp.asarray(np.full((1, H, W, 5), mu, np.float32)
                       + sigma * ks)
    valid = jnp.ones((1, V), jnp.float32)

    @functools.partial(jax.jit,
                       static_argnames=("band", "pair", "pair_rows",
                                        "n_blocks"))
    def _oob(R, t, band, pair, pair_rows, n_blocks):
        return cost_volume_cw_oob_fraction(
            dvol, R, t, jnp.asarray(K[None]), jnp.asarray(rays[None]),
            valid, band=band, pair=pair, pair_rows=pair_rows,
            n_blocks=n_blocks)

    def fracs(theta):
        R, t = _roll_poses(theta, 1, V)
        return [float(_oob(jnp.asarray(R), jnp.asarray(t), b, p, r,
                           n or 1)[0])
                for p, b, r, n in steps]

    thetas = np.concatenate([[0.0], np.geomspace(1e-3, 1.2, 120)])
    out = {}
    for th in thetas:                     # one walk, rungs fill in order
        fr = fracs(th)
        sel = next((j for j, f in enumerate(fr) if f <= tol),
                   len(steps))
        if sel not in out:
            out[sel] = (float(th), fr)
        if len(out) == len(steps) + 1:
            break
    missing = set(range(len(steps) + 1)) - set(out)
    if 0 in missing:
        raise RuntimeError("even theta=0 does not select rung 1")
    if len(steps) in missing:
        # The rescue rung covers every smooth-geometry pure-roll pose
        # (free window offsets), so no roll escalates to XLA; the caller
        # measures the fully-escalated program by forcing the guard
        # tolerance negative instead (MAGNET_TPU_CV_GUARD=-1 at trace
        # time), which is pose-independent and pays exactly the real
        # escalation cascade (every rung's plan + the XLA path).
        print("note: XLA escalation unreachable by pure roll; will "
              "measure it with a forced negative guard tolerance",
              flush=True)
    if missing:
        # A middle rung no PURE-ROLL pose selects: a cheaper rung's
        # admission covers every smooth-geometry frame it would catch
        # (e.g. the column-block rung under roll), so it is only
        # reachable via depth discontinuities. The caller prices its
        # occupancy at the next MEASURED rung — a conservative (slower)
        # bound, since the ladder only escalates past it.
        print(f"note: rung(s) {sorted(missing)} unreachable by pure "
              "roll; their occupancy will be priced at the next "
              "measured rung", flush=True)
    return out


def price_regimes(results, names, occupancy_path, shape):
    """Expected per-regime fps: occupancy-weighted per-rung timings
    (E[t] = t_rung1 + sum_i sum_r occ[i][r] * (t_r - t_rung1)/3)."""
    regimes = {}
    if not occupancy_path:
        return regimes
    with open(occupancy_path) as f:
        occ_rows = json.load(f)
    t1 = results[names[0]]["sec_per_frame"]
    d_iter = {}
    for nm in names[1:] + ["xla-escalated"]:
        if nm in results:       # rungs unreachable by pure roll fall
            d_iter[nm] = (results[nm]["sec_per_frame"] - t1) / 3.0
        else:                   # through to the xla-escalated price
            print(f"note: {nm} unmeasured; occupancy priced at "
                  "xla-escalated (conservative)", flush=True)
    dataset = {"scannet": "scannet", "kitti": "kitti"}[shape]
    by_speed = {}
    for row in occ_rows:
        if row["dataset"] != dataset:
            continue
        by_speed.setdefault(row["speed"], {})[
            row["sigma_ratio"]] = dict(zip(row["rungs"],
                                           row["occupancy"]))
    for speed, rows in by_speed.items():
        missing = [s for s in SIG_RATIOS if s not in rows]
        if missing:
            print(f"skip {speed}: no occupancy rows for {missing}")
            continue
        t = t1
        for s in SIG_RATIOS:
            for rung, p in rows[s].items():
                if rung == names[0] or p == 0.0:
                    continue
                key = "xla-escalated" if rung == "xla" else rung
                if key not in d_iter:           # occupancy has a rung
                    key = "xla-escalated"       # the ladder doesn't run
                t += p * d_iter[key]
        regimes[speed] = {"expected_fps": 1.0 / t,
                          "occupancy": rows}
        print(f"regime {speed:14} expected {1.0 / t:7.2f} fps",
              flush=True)
    return regimes


def price_only(artifact_path, occupancy_path, shape):
    """Re-run only the occupancy pricing against an EXISTING artifact's
    per-rung timings (no chip time); rewrites its per_regime."""
    with open(artifact_path) as f:
        art = json.load(f)
    names = art["ladder"]
    regimes = price_regimes(art["per_rung"], names, occupancy_path,
                            shape)
    art["per_regime"] = regimes
    with open(artifact_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"updated {artifact_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", choices=["scannet", "kitti"],
                    default="scannet")
    ap.add_argument("--occupancy", default="",
                    help="cv_motion_sweep --ladder --json output; rung "
                         "names must match the production ladder")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--loop_n", type=int, default=8)
    ap.add_argument("--out", default="")
    ap.add_argument("--price-only", default="",
                    help="existing bench_motion artifact: recompute "
                         "per_regime from its per-rung timings and the "
                         "--occupancy file, no measurement")
    args = ap.parse_args()
    if args.price_only:
        return price_only(args.price_only, args.occupancy, args.shape)

    import jax
    import jax.numpy as jnp

    from bench import example_inputs, example_variables
    from magnet_tpu.core.cache import enable_compilation_cache
    from magnet_tpu.core.dtypes import cast_floating
    from magnet_tpu.models.magnet import Magnet
    from magnet_tpu.ops import costvolume as cv_ops

    enable_compilation_cache()
    if args.shape == "scannet":
        img_h, img_w, V = 480, 640, 4
    else:
        img_h, img_w, V = 352, 1216, 2
    H, W = img_h // 4, img_w // 4

    tol = cv_ops._cv_guard_tol()
    assert tol is not None, "guard disabled (MAGNET_TPU_CV_GUARD=0)"
    steps = [(tuple(s) + (None, 1))[:4] for s in
             cv_ops.ladder_steps(H, W, V)]
    names = [f"{'pair' if p else 'band'}{b}" + (f"r{r}" if r else "")
             + (f"x{n}" if (n or 1) > 1 else "")
             for p, b, r, n in steps]

    model = Magnet(n_iters=3)
    inputs = example_inputs(img_h=img_h, img_w=img_w, n_views=V)
    variables = example_variables(model, inputs)
    K = np.asarray(inputs[5][0])
    rays = np.asarray(inputs[6][0])

    rung_poses = find_rung_poses(steps, tol, H, W, V, K, rays)
    for i, (th, fr) in sorted(rung_poses.items()):
        nm = names[i] if i < len(steps) else "xla-escalated"
        print(f"rung {nm:12} roll={np.degrees(th):6.2f} deg  "
              f"fracs={['%.2e' % f for f in fr]}", flush=True)

    compute_dtype = jnp.bfloat16

    def forward_n(n):
        @jax.jit
        def run(variables, ref_img, src_imgs, R, *rest):
            v = {"params": cast_floating(variables["params"],
                                         compute_dtype),
                 "batch_stats": variables["batch_stats"]}
            csrc = src_imgs.astype(compute_dtype)

            def body(_, carry):
                out = model.apply(v, carry, csrc, R, *rest,
                                  train=False)[-1]
                return carry + 0.0 * out[..., :1].astype(carry.dtype)

            return jax.lax.fori_loop(0, n, body,
                                     ref_img.astype(compute_dtype))
        return run

    def measure(run1, runN, inp):
        def timed(run):
            t0 = time.perf_counter()
            float(run(variables, *inp)[0, 0, 0, 0])
            return time.perf_counter() - t0
        t1 = min(timed(run1) for _ in range(args.reps))
        tN = min(timed(runN) for _ in range(args.reps))
        return (tN - t1) / (args.loop_n - 1)

    run1, runN = forward_n(1), forward_n(args.loop_n)
    results = {}
    for i in sorted(rung_poses):
        th, fr = rung_poses[i]
        nm = names[i] if i < len(steps) else "xla-escalated"
        R, t = _roll_poses(th, 1, V)
        inp = list(inputs)
        inp[2], inp[3] = jnp.asarray(R), jnp.asarray(t)
        float(run1(variables, *inp)[0, 0, 0, 0])      # compile/warm
        float(runN(variables, *inp)[0, 0, 0, 0])
        dt = measure(run1, runN, inp)
        results[nm] = {"sec_per_frame": dt, "fps": 1.0 / dt,
                       "roll_deg": float(np.degrees(th))}
        print(f"{nm:14} {1.0 / dt:7.2f} fps", flush=True)

    if "xla-escalated" not in results:
        # Forced full escalation (see find_rung_poses): a fresh trace
        # with a negative guard tolerance rejects every rung, so every
        # frame pays all rung plans + coverage checks + the XLA path —
        # the same cost a really-escalating frame pays. The env flip is
        # restored to its EXACT prior state (deleted if it was unset)
        # even on failure, so later traces in this process see the
        # caller's configuration.
        prev_guard = os.environ.get("MAGNET_TPU_CV_GUARD")
        try:
            os.environ["MAGNET_TPU_CV_GUARD"] = "-1"
            rune1, runeN = forward_n(1), forward_n(args.loop_n)
            float(rune1(variables, *inputs)[0, 0, 0, 0])
            float(runeN(variables, *inputs)[0, 0, 0, 0])
            dt = measure(rune1, runeN, inputs)
        finally:
            if prev_guard is None:
                os.environ.pop("MAGNET_TPU_CV_GUARD", None)
            else:
                os.environ["MAGNET_TPU_CV_GUARD"] = prev_guard
        results["xla-escalated"] = {
            "sec_per_frame": dt, "fps": 1.0 / dt,
            "method": "forced MAGNET_TPU_CV_GUARD=-1"}
        print(f"{'xla-escalated':14} {1.0 / dt:7.2f} fps (forced)",
              flush=True)

    # Pure-XLA cost-volume floor: trace a fresh program with the kernel
    # dispatch disabled (_use_pallas_cv reads the env at trace time).
    prev_cv = os.environ.get("MAGNET_TPU_PALLAS_CV")
    try:
        os.environ["MAGNET_TPU_PALLAS_CV"] = "0"
        runx1, runxN = forward_n(1), forward_n(args.loop_n)
        float(runx1(variables, *inputs)[0, 0, 0, 0])
        float(runxN(variables, *inputs)[0, 0, 0, 0])
        dt = measure(runx1, runxN, inputs)
    finally:
        if prev_cv is None:
            os.environ.pop("MAGNET_TPU_PALLAS_CV", None)
        else:
            os.environ["MAGNET_TPU_PALLAS_CV"] = prev_cv
    results["xla-only"] = {"sec_per_frame": dt, "fps": 1.0 / dt}
    print(f"{'xla-only':14} {1.0 / dt:7.2f} fps", flush=True)

    # ---- expected fps per regime from measured occupancy
    regimes = price_regimes(results, names, args.occupancy, args.shape)

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"benchmarks/bench_motion_{args.shape}.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    payload = {"shape": args.shape, "tol": tol, "ladder": names,
               "per_rung": results, "per_regime": regimes,
               "loop_n": args.loop_n, "reps": args.reps}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

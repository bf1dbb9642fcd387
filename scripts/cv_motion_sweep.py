#!/usr/bin/env python
"""Motion-regime validation of the Pallas cost-volume kernel's
band-locality approximation (VERDICT r2 "Next #1").

The fused kernel (kernels/costvolume_pallas.py) is exact only while each
row-tile's sampled source rows fit its prefetched slab(s): band - 1 = 15
rows for the full-band kernel, 2*c_rows - 2 = 6 rows per 2-row pair for
the (default) pair kernel. This script measures the out-of-band sample
fraction — the exact fraction that silently degrades to zero cost — over
synthetic scenes and camera trajectories built at the magnitudes the real
loaders produce:

  * ScanNet: window_radius 20, V=4 (offsets +-10/+-20 frames at 30 fps,
    test_scripts/magnet/scannet.txt), handheld translation 0.3-1.2 m/s and
    rotation up to ~30 deg/s; depth 0.5-10 m with box discontinuities.
  * KITTI: window_radius 2, V=2 (offsets +-2 frames at 10 Hz,
    test_scripts/magnet/kitti_eigen.txt), forward motion 40-100 km/h with
    up to 10 deg/s yaw; ground-plane + object scenes, depth 2-80 m.

Candidate depths follow the pipeline exactly: d = mu + sigma*k over the
5-bin inverse-CDF k_list (models/magnet.py:41-49), with sigma/mu swept
over the refinement schedule (iteration 1 -> 3).

With --deltas it additionally runs both cost-volume paths end to end
(random features) and reports the max/mean cost deviation — cheap on TPU,
slow in CPU interpret mode.

Output: one table row per (dataset, speed, sigma-ratio, band, variant),
plus a JSON summary (--json PATH). docs/KERNELS.md records the measured
bound; the runtime guard (MAGNET_TPU_CV_GUARD, ops/costvolume.py)
enforces it per frame in production.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from magnet_tpu.kernels.costvolume_pallas import (  # noqa: E402
    cost_volume_cw_oob_fraction, cost_volume_cw_pallas)


@functools.partial(jax.jit,
                   static_argnames=("band", "pair", "pair_rows",
                                    "n_blocks"))
def _oob_jit(dvol, R, t, K, rays, valid, band, pair, pair_rows=None,
             n_blocks=1):
    return cost_volume_cw_oob_fraction(dvol, R, t, K, rays, valid,
                                       band=band, pair=pair,
                                       pair_rows=pair_rows,
                                       n_blocks=n_blocks)
from magnet_tpu.models.magnet import (  # noqa: E402
    gaussian_sampling_offsets)
from magnet_tpu.ops.costvolume import _cost_volume_cw_xla  # noqa: E402


def _digest(*parts):
    """Deterministic seed digest: python's str hash is randomized per
    process (PYTHONHASHSEED), which made sweep results non-reproducible
    run to run."""
    import zlib
    return zlib.crc32("/".join(map(str, parts)).encode())


def _rot(axis, ang):
    c, s = np.cos(ang), np.sin(ang)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    R = np.eye(3)
    R[i, i] = c
    R[j, j] = c
    R[i, j] = -s if axis != 1 else s
    R[j, i] = s if axis != 1 else -s
    return R


def _pose(cam_t, rx, ry, rz):
    """world->source_cam extrinsics for a source camera at position
    ``cam_t`` (in the reference camera frame) rotated by (rx, ry, rz);
    the reference camera is the world frame, so R,t here are exactly the
    relative pose the pipeline feeds the cost volume
    (x_src = R @ x_ref + t)."""
    Rc = _rot(2, rz) @ _rot(1, ry) @ _rot(0, rx)       # cam orientation
    R = Rc.T
    t = -Rc.T @ np.asarray(cam_t, np.float64)
    return R.astype(np.float32), t.astype(np.float32)


def _intrinsics(H, W, fx, fy, cx, cy):
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
    grid = np.ones((H, W, 3), np.float32)
    grid[:, :, 0] = (np.arange(W)[None] + 0.5 - cx) / fx
    grid[:, :, 1] = (np.arange(H)[:, None] + 0.5 - cy) / fy
    return K, grid.transpose(2, 0, 1).reshape(3, -1)


def _boxes(rng, mu, n, lo, hi):
    H, W = mu.shape
    for _ in range(n):
        h0 = rng.randint(0, H - 4)
        w0 = rng.randint(0, W - 4)
        h1 = h0 + rng.randint(4, max(5, H // 3))
        w1 = w0 + rng.randint(4, max(5, W // 3))
        mu[h0:h1, w0:w1] = rng.uniform(lo, hi)
    return mu


def scannet_scene(rng, H=120, W=160):
    """Indoor: 2-5 m walls with furniture-scale box discontinuities."""
    base = 2.5 + 1.5 * np.sin(np.linspace(0, 2, W))[None, :] \
        + 0.8 * np.cos(np.linspace(0, 3, H))[:, None]
    mu = _boxes(rng, base, 6, 0.8, 9.0)
    return np.clip(mu, 0.5, 10.0).astype(np.float32)


def kitti_scene(rng, H=88, W=304, fy=180.4, cy=37.5, cam_h=1.65):
    """Road: ground plane below the horizon, far field above, car-scale
    boxes — the depth-edge-heavy regime that stresses row locality."""
    v = np.arange(H)[:, None] + 0.5
    with np.errstate(divide="ignore"):
        ground = fy * cam_h / np.maximum(v - cy, 1e-3)
    mu = np.where(v > cy + 2, ground, 80.0) * np.ones((1, W))
    mu = _boxes(rng, mu, 8, 5.0, 60.0)
    return np.clip(mu, 2.0, 80.0).astype(np.float32)


def regimes():
    """(name, scene_fn, H, W, intrinsics, view poses builder, sigma caps)"""
    out = []

    # ScanNet: offsets +-10/+-20 frames; per-frame motion at 30 fps.
    sc_K = _intrinsics(120, 160, 144.4, 144.4, 80.0, 60.0)
    for speed, (dt_f, dr_f) in {
            "slow": (0.010, np.deg2rad(0.33)),     # 0.3 m/s, 10 deg/s
            "normal": (0.023, np.deg2rad(0.66)),   # 0.7 m/s, 20 deg/s
            "fast": (0.040, np.deg2rad(1.0)),      # 1.2 m/s, 30 deg/s
    }.items():
        def poses(rng, dt_f=dt_f, dr_f=dr_f):
            Rs, ts = [], []
            for off in (-20, -10, 10, 20):
                n = abs(off)
                direc = rng.randn(3)
                direc /= np.linalg.norm(direc)
                R, t = _pose(direc * dt_f * n,
                             *(rng.uniform(-1, 1, 3) * dr_f * n))
                Rs.append(R)
                ts.append(t)
            return np.stack(Rs), np.stack(ts)
        out.append(("scannet", speed, scannet_scene, 120, 160, sc_K,
                    poses, (0.03, 3.0)))

    # KITTI: offsets +-2 frames at 10 Hz; forward motion + yaw.
    ki_K = _intrinsics(88, 304, 180.4, 180.4, 152.0, 37.5)
    for speed, (v_ms, yaw_s) in {
            "40kmh": (11.1, np.deg2rad(2.0)),
            "80kmh": (22.2, np.deg2rad(5.0)),
            "100kmh+turn": (27.8, np.deg2rad(10.0)),
    }.items():
        def poses(rng, v_ms=v_ms, yaw_s=yaw_s):
            Rs, ts = [], []
            for off in (-2, 2):
                dt = off / 10.0                      # seconds
                jitter = rng.uniform(-1, 1, 2) * np.deg2rad(0.2)
                R, t = _pose([0.0, 0.0, v_ms * dt],  # +z forward
                             jitter[0], yaw_s * dt, jitter[1])
                Rs.append(R)
                ts.append(t)
            return np.stack(Rs), np.stack(ts)
        out.append(("kitti", speed, kitti_scene, 88, 304, ki_K,
                    poses, (0.5, 20.0)))
    return out


def _parse_rung(spec):
    """'pair:16:4' -> (pair=True, band=16, pair_rows=4, n_blocks=1);
    'band:32' -> (False, 32, None, 1); 'pair:48:16:2' adds 2 column
    blocks per pair."""
    f = spec.split(":")
    pair = {"pair": True, "band": False}[f[0]]
    band = int(f[1])
    rows = int(f[2]) if len(f) > 2 else None
    blocks = int(f[3]) if len(f) > 3 else 1
    return pair, band, rows, blocks


def ladder_mode(args):
    """Per (regime, sigma_ratio): the fraction of frames that ride each
    ladder rung — the FIRST rung whose out-of-band fraction is within
    --tol, exactly the production guard's dispatch rule
    (ops/costvolume.py) — plus 'xla' when none covers. This is the
    occupancy input to the per-regime throughput model
    (scripts/bench_motion.py): occupancy x measured per-rung frame times
    = expected fps on data that moves like the regime."""
    from magnet_tpu.ops.costvolume import ladder_steps
    k_list = gaussian_sampling_offsets(3.0, 5)
    rows_out = []
    for name, speed, scene_fn, H, W, (K, rays), pose_fn, (sig_lo,
                                                          sig_hi) in \
            regimes():
        if args.rungs == "auto":
            # The production ladder for THIS dataset's dpv shape (view
            # count from the regime's pose generator).
            V0 = pose_fn(np.random.RandomState(0))[0].shape[0]
            rungs = [(tuple(s) + (None, 1))[:4]
                     for s in ladder_steps(H, W, V0)]
        else:
            rungs = [_parse_rung(s) for s in args.rungs.split(",")]
        names = [f"{'pair' if p else 'band'}{b}" + (f"r{r}" if r else "")
                 + (f"x{n}" if (n or 1) > 1 else "")
                 for p, b, r, n in rungs]
        hdr = (f"{'dataset':8} {'speed':12} {'sig/mu':7} "
               + " ".join(f"{n:>12}" for n in names) + f" {'xla':>10}")
        print(hdr)
        print("-" * len(hdr))
        for sig_ratio in (0.25, 0.10, 0.03):          # iter 1 -> 3
            counts = [0] * (len(rungs) + 1)
            for seed in range(args.seeds):
                rng = np.random.RandomState(
                    1000 + seed + _digest(name, speed) % 1000)
                mu = scene_fn(rng)
                sigma = np.clip(mu * sig_ratio, sig_lo, sig_hi)
                dvol = (mu[..., None]
                        + sigma[..., None] * k_list[None, None])
                Rs, ts = pose_fn(rng)
                V = Rs.shape[0]
                a = (jnp.asarray(dvol[None]), jnp.asarray(Rs[None]),
                     jnp.asarray(ts[None]), jnp.asarray(K[None]),
                     jnp.asarray(rays[None]),
                     jnp.ones((1, V), jnp.float32))
                chosen = len(rungs)                   # xla
                for i, (p, b, r, n) in enumerate(rungs):
                    frac = float(_oob_jit(*a, band=b, pair=p,
                                          pair_rows=r, n_blocks=n)[0])
                    if frac <= args.tol:
                        chosen = i
                        break
                counts[chosen] += 1
            occ = [c / args.seeds for c in counts]
            print(f"{name:8} {speed:12} {sig_ratio:<7} "
                  + " ".join(f"{o:10.3f}" for o in occ))
            rows_out.append({"dataset": name, "speed": speed,
                             "sigma_ratio": sig_ratio, "tol": args.tol,
                             "rungs": names + ["xla"], "occupancy": occ})
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows_out, f, indent=1)
        print(f"\nwrote {args.json}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--deltas", action="store_true",
                    help="also run both CV paths and report cost deltas")
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--bands", type=int, nargs="*", default=[16, 32])
    ap.add_argument("--ladder", action="store_true",
                    help="report per-regime rung occupancy instead of "
                         "raw fractions")
    ap.add_argument("--rungs", default="auto",
                    help="comma list of pair:band[:rows[:blocks]]|"
                         "band:band specs; 'auto' (default) uses the "
                         "production ladder_steps for each dataset's "
                         "dpv shape")
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--json", default="")
    args = ap.parse_args()
    if args.ladder:
        ladder_mode(args)
        return

    k_list = gaussian_sampling_offsets(3.0, 5)             # MAGNET defaults
    rows, summary = [], {}
    hdr = (f"{'dataset':8} {'speed':12} {'sig/mu':7} {'band':5} "
           f"{'variant':7} {'oob_frac':>10} {'worst':>10}"
           + ("  max_delta mean_delta" if args.deltas else ""))
    print(hdr)
    print("-" * len(hdr))

    for name, speed, scene_fn, H, W, (K, rays), pose_fn, (sig_lo,
                                                          sig_hi) in \
            regimes():
        for sig_ratio in (0.25, 0.10, 0.03):          # iter 1 -> 3
            for band in args.bands:
                for pair in (False, True):
                    fracs, deltas = [], []
                    for seed in range(args.seeds):
                        rng = np.random.RandomState(
                            1000 + seed + _digest(name, speed) % 1000)
                        mu = scene_fn(rng)
                        sigma = np.clip(mu * sig_ratio, sig_lo, sig_hi)
                        dvol = (mu[..., None]
                                + sigma[..., None] * k_list[None, None])
                        Rs, ts = pose_fn(rng)
                        V = Rs.shape[0]
                        a = (jnp.asarray(dvol[None]),
                             jnp.asarray(Rs[None]), jnp.asarray(ts[None]),
                             jnp.asarray(K[None]), jnp.asarray(rays[None]),
                             jnp.ones((1, V), jnp.float32))
                        frac = float(_oob_jit(*a, band=band,
                                              pair=pair)[0])
                        fracs.append(frac)
                        if args.deltas:
                            rngf = np.random.RandomState(seed)
                            C = 8
                            ref = rngf.randn(1, H, W, C).astype(np.float32)
                            src = rngf.randn(1, V, H, W, C).astype(
                                np.float32)
                            smu = np.tile(mu, (1, V, 1, 1)).astype(
                                np.float32)
                            ssig = np.tile(sigma, (1, V, 1, 1)).astype(
                                np.float32)
                            full = (a[0], jnp.asarray(ref),
                                    jnp.asarray(src), jnp.asarray(smu),
                                    jnp.asarray(ssig), a[1], a[2], a[5],
                                    a[3], a[4])
                            interp = jax.default_backend() != "tpu"
                            xla = np.asarray(_cost_volume_cw_xla(*full,
                                                                 5.0))
                            pal = np.asarray(cost_volume_cw_pallas(
                                *full, 5.0, band=band,
                                interpret=interp, pair=pair))
                            d = np.abs(pal - xla)
                            deltas.append((d.max(), d.mean()))
                    row = {
                        "dataset": name, "speed": speed,
                        "sigma_ratio": sig_ratio, "band": band,
                        "variant": "pair" if pair else "band",
                        "oob_mean": float(np.mean(fracs)),
                        "oob_worst": float(np.max(fracs)),
                    }
                    line = (f"{name:8} {speed:12} {sig_ratio:<7} "
                            f"{band:<5} {row['variant']:7} "
                            f"{row['oob_mean']:10.6f} "
                            f"{row['oob_worst']:10.6f}")
                    if deltas:
                        row["max_delta"] = float(
                            np.max([d[0] for d in deltas]))
                        row["mean_delta"] = float(
                            np.mean([d[1] for d in deltas]))
                        line += (f"  {row['max_delta']:9.4f} "
                                 f"{row['mean_delta']:10.6f}")
                    print(line)
                    rows.append(row)
                    key = (name, row["variant"], band)
                    summary[key] = max(summary.get(key, 0.0),
                                       row["oob_worst"])

    print("\nWorst out-of-band fraction per (dataset, variant, band):")
    for (name, variant, band), worst in sorted(summary.items()):
        print(f"  {name:8} {variant:7} band={band:<3} {worst:.6f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()

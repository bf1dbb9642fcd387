#!/usr/bin/env python
"""Multi-stream serving benchmark (VERDICT r2 "Next #3").

Measures aggregate frames/sec of S independent video streams dispatched
one-per-device through serve/streams.py's shard_map runner.

  python scripts/bench_streams.py               # current backend,
                                                # S = visible devices
                                                # (1 on the axon chip)
  python scripts/bench_streams.py --virtual 8   # subprocess with 8
                                                # virtual CPU devices:
                                                # S=8 vs S=1 scaling at a
                                                # reduced shape

Timing discipline: the S-stream step runs inside a jitted fori_loop whose
carry depends on the previous output (no dispatch pipelining); min over
reps. The structural linear-scaling argument is separate and stronger:
the compiled multi-stream program contains no collectives
(tests/test_streams.py), so per-chip work is exactly the single-stream
program.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def measure(S, H, W, V, n_iters, n_loop, reps, dtype):
    import jax
    import jax.numpy as jnp

    import bench
    from magnet_tpu.core import mesh as mesh_lib
    from magnet_tpu.core.dtypes import cast_floating
    from magnet_tpu.models.magnet import Magnet
    from magnet_tpu.serve import streams
    from tests.test_streams import _stream_batch

    mesh = mesh_lib.make_mesh(S)
    model = Magnet(n_iters=n_iters)
    batch = _stream_batch(S, V=V, H=H, W=W)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch["ref_img"][:1]),
        jnp.asarray(batch["src_imgs"][:1]), jnp.asarray(batch["R"][:1]),
        jnp.asarray(batch["t"][:1]), jnp.asarray(batch["is_valid"][:1]),
        jnp.asarray(batch["intM"][:1]), jnp.asarray(batch["rays2d"][:1]))
    variables = bench.realistic_depth_init(variables)
    cvars = {"params": cast_floating(variables["params"], dtype),
             "batch_stats": variables["batch_stats"]}

    run = streams.make_multistream_forward(model, mesh=mesh,
                                           n_iters=n_iters)
    sharded = streams.shard_streams(mesh, batch)
    args = tuple(sharded[k] for k in ("ref_img", "src_imgs", "R", "t",
                                      "is_valid", "intM", "rays2d"))
    args = (args[0].astype(dtype), args[1].astype(dtype)) + args[2:]

    def forward_n(n):
        @jax.jit
        def f(cvars, ref, *rest):
            def body(_, carry):
                out = run.jitted(cvars, carry, *rest)
                return carry + (0.0 * jnp.sum(out)).astype(carry.dtype)
            return jax.lax.fori_loop(0, n, body, ref)
        return f

    run1, runN = forward_n(1), forward_n(n_loop)
    float(jnp.sum(run1(cvars, *args)))          # compile + warmup
    float(jnp.sum(runN(cvars, *args)))

    def timed(fn):
        t0 = time.perf_counter()
        float(jnp.sum(fn(cvars, *args)))
        return time.perf_counter() - t0

    t1 = min(timed(run1) for _ in range(reps))
    tN = min(timed(runN) for _ in range(reps))
    dt = (tN - t1) / (n_loop - 1)               # per S-stream step
    return S / dt, 1.0 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="re-exec on N virtual CPU devices and measure "
                         "S=N vs S=1 scaling at a reduced shape")
    ap.add_argument("--height", type=int, default=0)
    ap.add_argument("--width", type=int, default=0)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--loop", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--streams", type=int, default=0)
    args = ap.parse_args()

    if args.virtual:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
        kept = [t for t in env.get("XLA_FLAGS", "").split()
                if "xla_force_host_platform_device_count" not in t]
        kept.append(
            f"--xla_force_host_platform_device_count={args.virtual}")
        env["XLA_FLAGS"] = " ".join(kept)
        h = args.height or 64
        w = args.width or 96
        for s in (1, args.virtual):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--streams", str(s), "--height", str(h), "--width",
                   str(w), "--views", str(args.views), "--iters",
                   str(args.iters), "--loop", str(args.loop), "--reps",
                   str(args.reps)]
            subprocess.run(cmd, env=env, check=True)
        return

    import jax
    S = args.streams or len(jax.devices())
    H = args.height or 480
    W = args.width or 640
    import jax.numpy as jnp
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
        else jnp.float32
    agg, per_step = measure(S, H, W, args.views, args.iters, args.loop,
                            args.reps, dtype)
    print(json.dumps({
        "metric": "multistream_serving",
        "streams": S,
        "backend": jax.default_backend(),
        "shape": f"{H}x{W} V={args.views} iters={args.iters}",
        "aggregate_fps": round(agg, 3),
        "fps_per_stream": round(agg / S, 3),
    }))


if __name__ == "__main__":
    main()

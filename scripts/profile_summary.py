#!/usr/bin/env python
"""Capture a device trace of the flagship forward and print a per-category
and per-op summary (development tool)."""
import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")


def capture(trace_dir="/tmp/jaxtrace"):
    import jax
    import jax.numpy as jnp
    from bench import example_inputs, example_variables
    from magnet_tpu.core.dtypes import cast_floating
    from magnet_tpu.models.magnet import Magnet

    model = Magnet(n_iters=3)
    inputs = example_inputs()
    variables = example_variables(model, inputs)

    @jax.jit
    def run(variables, ref_img, *rest):
        v = {"params": cast_floating(variables["params"], jnp.bfloat16),
             "batch_stats": variables["batch_stats"]}
        cref = ref_img.astype(jnp.bfloat16)
        csrc = rest[0].astype(jnp.bfloat16)
        def body(_, carry):
            out = model.apply(v, carry, csrc, *rest[1:], train=False)[-1]
            return carry + 0.0 * out[..., :1].astype(carry.dtype)
        return jax.lax.fori_loop(0, 4, body, cref)

    float(run(variables, *inputs)[0, 0, 0, 0])
    jax.profiler.start_trace(trace_dir)
    float(run(variables, *inputs)[0, 0, 0, 0])
    jax.profiler.stop_trace()


def summarize(trace_dir="/tmp/jaxtrace", n_frames=4, top=16, module=None):
    path = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        trace = json.load(f)
    pids = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    cat = collections.Counter()
    name_time = collections.Counter()
    details = {}
    mod = collections.Counter()
    mod_ops = {}
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if pids.get(e["pid"], "") != "/device:TPU:0":
            continue
        n = e["name"]
        if n.startswith(("jit_", "while")):
            continue
        a = e.get("args", {})
        cat[a.get("hlo_category", "?")] += e["dur"]
        name_time[n] += e["dur"]
        if n not in details:
            details[n] = a.get("long_name", "")[:100]
        src = a.get("source_stack", "")
        key = "other"
        # "costvolume" before "gnet": "gnet" substring-matches frames from
        # models/magnet.py (the cost-volume call site) otherwise.
        for tag in ("efficientnet", "psmnet", "densedepth", "costvolume",
                    "nn/gnet", "kernels/gnet", "resample", "upsample"):
            if tag in src:
                key = tag.split("/")[-1]
                break
        mod[key] += e["dur"]
        if module is not None and module in src:
            mod_ops.setdefault(n, [0, src])[0] += e["dur"]
    print(f"total: {sum(cat.values()) / 1e3 / n_frames:.1f} ms/frame")
    for c, d in cat.most_common(10):
        print(f"{d / 1e3 / n_frames:8.2f} ms  {c}")
    print("\nby module:")
    for k, d in mod.most_common():
        print(f"{d / 1e3 / n_frames:8.2f} ms  {k}")
    print("\ntop ops:")
    for n, d in name_time.most_common(top):
        print(f"{d / 1e3 / n_frames:7.2f} ms {n[:26]:26s} {details[n][:80]}")
    if module is not None:
        print(f"\nops in '{module}':")
        for n, (d, src) in sorted(mod_ops.items(), key=lambda kv: -kv[1][0]):
            if d / 1e3 / n_frames < 0.02:
                continue
            print(f"{d / 1e3 / n_frames:7.2f} ms {n[:26]:26s} "
                  f"{details[n][:60]} | {src[:60]}")


def copies(trace_dir="/tmp/jaxtrace", n_frames=4, top=24):
    """Every op in the 'copy' HLO category with its shapes (long_name)
    and producing source line — the instrumentation for attributing the
    trunk's layout-copy budget to specific producer/consumer layout
    transitions (docs/KERNELS.md trunk roofline)."""
    path = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        trace = json.load(f)
    pids = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    agg = {}
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if pids.get(e["pid"], "") != "/device:TPU:0":
            continue
        a = e.get("args", {})
        # layout copies surface as 'data formatting' in current traces
        if a.get("hlo_category", "") not in ("copy", "data formatting"):
            continue
        n = e["name"]
        row = agg.setdefault(n, [0, 0, a.get("long_name", ""),
                                 a.get("source_stack", "")])
        row[0] += e["dur"]
        row[1] += 1
    total = sum(r[0] for r in agg.values())
    print(f"copy total: {total / 1e3 / n_frames:.2f} ms/frame "
          f"({len(agg)} distinct ops)")
    for n, (d, c, long, src) in sorted(agg.items(),
                                       key=lambda kv: -kv[1][0])[:top]:
        print(f"{d / 1e3 / n_frames:6.3f} ms x{c:<3} {n[:24]:24s} "
              f"{long[:110]}")
        if src:
            print(f"{'':14s}src: {src[:120]}")


if __name__ == "__main__":
    import shutil
    shutil.rmtree("/tmp/jaxtrace", ignore_errors=True)
    capture()
    summarize()

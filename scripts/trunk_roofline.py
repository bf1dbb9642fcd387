#!/usr/bin/env python
"""Analytic roofline for the EfficientNet-B5 trunk at the bench shape.

The trunk is the last frame-budget bucket without a Pallas win (8.4 ms of
the 29.4 ms frame; every structural attack measured and rejected — see
docs/KERNELS.md "Documented negative results"). This script quantifies
how far from speed-of-light that 8.4 ms actually is, so "XLA-bound" is a
measured conclusion: it walks `b5_stage_config()` (the same config the
model builds from, magnet_tpu/nn/efficientnet.py), counts MXU FLOPs and
minimum HBM traffic per op, and prints per-stage compute/bandwidth
rooflines for TPU v5e.

Traffic accounting (deliberately optimistic = lower-bound time):
- every conv reads its input once, writes its output once, reads its
  weights once (bf16); BN/activation/SE arithmetic is assumed perfectly
  fused into the producing conv (zero extra traffic);
- residual adds read the shortcut once;
- no relayout/padding traffic (the real trunk pays lane padding at C=3
  stem input and batch-interleaved layouts — all counted as zero here).

v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from magnet_tpu.nn.efficientnet import b5_stage_config

PEAK_TFLOPS = 197.0
PEAK_GBPS = 819.0
BYTES = 2  # bf16


def conv_cost(H, W, Cin, Cout, K, stride, groups=1, n=1):
    Ho, Wo = -(-H // stride), -(-W // stride)
    flops = 2 * Ho * Wo * K * K * (Cin // groups) * Cout * n
    traffic = BYTES * (H * W * Cin * n + Ho * Wo * Cout * n
                       + K * K * (Cin // groups) * Cout)
    return flops, traffic, Ho, Wo


def trunk_roofline(n_frames=5, H=480, W=640):
    rows = []

    def add(name, fl, tr):
        rows.append((name, fl, tr))

    # stem: 3x3 s2, 3 -> 48
    fl, tr, h, w = conv_cost(H, W, 3, 48, 3, 2, n=n_frames)
    add("stem", fl, tr)
    for si, stage in enumerate(b5_stage_config()):
        sfl = str_ = 0
        for cfg in stage:
            cin, cout, k, s, e = (cfg["in_ch"], cfg["out_ch"],
                                  cfg["kernel"], cfg["stride"],
                                  cfg["expand"])
            mid = cin * e
            if cfg["btype"] == "ir":
                fl, tr, _, _ = conv_cost(h, w, cin, mid, 1, 1, n=n_frames)
                sfl += fl; str_ += tr
            fl, tr, h2, w2 = conv_cost(h, w, mid, mid, k, s, groups=mid,
                                       n=n_frames)
            sfl += fl; str_ += tr
            # SE: pool (reads the map), 2 tiny matmuls, gate multiply
            # (read map + write map)
            red = max(1, int(cin * 0.25))
            sfl += 2 * (mid * red + red * mid) * n_frames
            str_ += BYTES * (2 * h2 * w2 * mid * n_frames
                             + 2 * mid * red)
            fl, tr, _, _ = conv_cost(h2, w2, mid, cout, 1, 1, n=n_frames)
            sfl += fl; str_ += tr
            if cin == cout and s == 1:  # residual read
                str_ += BYTES * h2 * w2 * cout * n_frames
            h, w = h2, w2
        add(f"stage{si} ({len(stage)}x {stage[0]['btype']}"
            f" k{stage[0]['kernel']} c{stage[0]['out_ch']}"
            f" @{h}x{w})", sfl, str_)
        ch = stage[-1]["out_ch"]
    fl, tr, _, _ = conv_cost(h, w, ch, 2048, 1, 1, n=n_frames)
    add("conv_head", fl, tr)

    tot_fl = sum(r[1] for r in rows)
    tot_tr = sum(r[2] for r in rows)
    print(f"{'op':44s} {'GFLOP':>8s} {'MB':>8s} {'t_mxu':>7s} "
          f"{'t_hbm':>7s} {'bound':>6s}")
    for name, fl, tr in rows:
        t_mxu = fl / (PEAK_TFLOPS * 1e12) * 1e3
        t_hbm = tr / (PEAK_GBPS * 1e9) * 1e3
        bound = "MXU" if t_mxu > t_hbm else "HBM"
        print(f"{name:44s} {fl / 1e9:8.2f} {tr / 1e6:8.1f} "
              f"{t_mxu:6.2f}m {t_hbm:6.2f}m {bound:>6s}")
    t_mxu = tot_fl / (PEAK_TFLOPS * 1e12) * 1e3
    t_hbm = tot_tr / (PEAK_GBPS * 1e9) * 1e3
    # speed-of-light: each op takes max(compute, bandwidth) time
    sol = sum(max(fl / (PEAK_TFLOPS * 1e12), tr / (PEAK_GBPS * 1e9))
              for _, fl, tr in rows) * 1e3
    print(f"{'TOTAL (' + str(n_frames) + ' frames)':44s} "
          f"{tot_fl / 1e9:8.2f} {tot_tr / 1e6:8.1f} "
          f"{t_mxu:6.2f}m {t_hbm:6.2f}m")
    print(f"\nspeed-of-light (per-stage max(mxu, hbm) sum): {sol:.2f} ms")
    return sol


if __name__ == "__main__":
    trunk_roofline()

"""Dispatch-gate regression guard: every production Pallas kernel must
report `supported()` at the ScanNet bench shapes (640x480, V=4 -> dpv
120x160, PSM trunk 240x320/120x160, decoder 15x20 -> 120x160).

If a gate change silently excludes a kernel, bench.py falls back to XLA
and the regression only shows as a diffuse fps drop; this pins the
engagement decisions themselves (shapes mirror bench.py / the profile).
"""

import numpy as np


def test_scannet_gate_engagement():
    from magnet_tpu.kernels import (convstream_pallas as cs,
                                    costvolume_pallas as cv,
                                    gnet_pallas as gp,
                                    headchain_pallas as hc,
                                    psmstage_pallas as ps,
                                    psmtrans_pallas as pt,
                                    psmtrans2_pallas as pt2,
                                    spptail_pallas as st,
                                    upstage_pallas as up)
    # decoder (5-frame batched D-Net)
    assert up.supported((5, 60, 80, 512), (5, 120, 160, 40))     # up3
    assert cs.up2_supported((5, 30, 40, 1024), (5, 60, 80, 64))  # up2
    # prediction heads at dpv resolution
    assert hc.supported((5, 120, 160, 256))
    # PSM trunk (input 480x640 -> stem /2 -> layers /4)
    assert ps.supported((5, 240, 320, 32), 2, 1, 2)    # stem pair
    assert pt.supported((5, 240, 320, 32))             # layer2_0 s2
    assert ps.supported((5, 120, 160, 64), 15, 1, 2)   # layer2 tail
    assert pt2.supported((5, 120, 160, 64), 2)         # layer3_0 expand
    assert ps.supported((5, 120, 160, 128), 2, 1, 2)   # layer3 tail
    assert ps.supported((5, 120, 160, 128), 2, 2, 2)   # layer4 (dil 2)
    assert st.supported((5, 120, 160, 128), 64)        # SPP tail
    # refinement loop at batch 1
    assert gp.supported((1, 120, 160, 5), 128)
    assert cv.supported(np.zeros((1, 120, 160, 5)), 120, 160)


def test_kitti_gate_engagement():
    """KITTI bench shapes (352x1216, V=2 -> batch 3, dpv 88x304). The
    whole set below compiled and ran on a real v5e (scripts/
    bench_kitti.py, 32.6 fps); pinning both the engaged and the
    fallen-back decisions guards against gates drifting into the scoped-
    VMEM OOM this shape exposed (spptail tile 22 allocated 16.64 MB)."""
    import numpy as np
    from magnet_tpu.kernels import (convstream_pallas as cs,
                                    costvolume_pallas as cv,
                                    gnet_pallas as gp,
                                    headchain_pallas as hc,
                                    psmstage_pallas as ps,
                                    psmtrans_pallas as pt,
                                    psmtrans2_pallas as pt2,
                                    spptail_pallas as st,
                                    upstage_pallas as up)
    # engaged at KITTI
    assert up.supported((3, 44, 152, 512), (3, 88, 304, 40))
    assert cs.up2_supported((3, 22, 76, 1024), (3, 44, 152, 64))
    assert hc.supported((3, 88, 304, 256))
    assert ps.supported((3, 88, 304, 64), 15, 1, 2)     # layer2 tail
    assert pt2.supported((3, 88, 304, 64), 2)           # layer3_0
    assert st.supported((3, 88, 304, 128), 64)          # SPP tail
    assert gp.supported((1, 88, 304, 5), 128)
    assert cv.supported(np.zeros((1, 88, 304, 5)), 88, 304)
    # XLA fallbacks at KITTI (whole-map chains bust VMEM at 176x608 /
    # 128ch x 304w; XLA measured faster there anyway — docs/KERNELS.md)
    assert not ps.supported((3, 176, 608, 32), 2, 1, 2)
    assert not pt.supported((3, 176, 608, 32))
    assert not ps.supported((3, 88, 304, 128), 2, 1, 2)
    assert not ps.supported((3, 88, 304, 128), 2, 2, 2)


def test_f32_traces_fall_back():
    """A f32 trace (debug / the driver's compile check before the bf16
    cast) must NOT engage the 2-byte-budgeted kernels at the big
    shapes — it crashes tile selection otherwise (round-2 regression)."""
    from magnet_tpu.kernels import (convstream_pallas as cs,
                                    upstage_pallas as up)
    assert not up.supported((5, 60, 80, 512), (5, 120, 160, 40), 4)
    assert not cs.up2_supported((5, 30, 40, 1024), (5, 60, 80, 64), 4)

"""Golden tests of the fused Pallas cost-volume kernel against the XLA
reference path (ops/costvolume.py), interpret mode on CPU.

The XLA path is itself golden-tested against torch F.grid_sample
(tests/test_costvolume.py) and the full reference pipeline
(tests/test_reference_oracle.py), so agreement here chains back to the
reference homography semantics (homography.py:79-161)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.kernels.costvolume_pallas import (
    cost_volume_cw_oob_fraction, cost_volume_cw_pallas,
    cost_volume_cw_pallas_guarded, cost_volume_cw_pallas_ladder,
    supported)
from magnet_tpu.ops.costvolume import _cost_volume_cw_xla, cost_volume_cw


def _inputs(B=2, V=3, H=24, W=32, C=8, D=5, seed=0, motion=0.03):
    rng = np.random.RandomState(seed)
    ref = rng.randn(B, H, W, C).astype(np.float32)
    src = rng.randn(B, V, H, W, C).astype(np.float32)
    mu = rng.uniform(1, 5, (B, V, H, W)).astype(np.float32)
    sig = rng.uniform(0.1, 1.0, (B, V, H, W)).astype(np.float32)

    def rot(ang):
        c, s = np.cos(ang), np.sin(ang)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    R = np.stack([np.stack([rot(rng.uniform(-motion, motion))
                            for _ in range(V)]) for _ in range(B)])
    t = rng.uniform(-motion, motion, (B, V, 3)).astype(np.float32)
    valid = np.ones((B, V), np.float32)
    valid[-1, -1] = 0.0
    fx = 0.9 * W
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]], np.float32)
    grid = np.ones((H, W, 3), np.float32)
    grid[:, :, 0] = (np.arange(W)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(H)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = np.tile(grid.transpose(2, 0, 1).reshape(1, 3, -1), (B, 1, 1))
    intM = np.tile(K, (B, 1, 1))
    dvol = rng.uniform(1, 5, (B, H, W, D)).astype(np.float32)
    return tuple(jnp.asarray(a) for a in
                 (dvol, ref, src, mu, sig, R, t, valid, intM, rays))


@pytest.mark.parametrize("pair", [False, True])
def test_pallas_cv_matches_xla_f32(pair):
    args = _inputs()
    xla = np.asarray(cost_volume_cw(*args, 5.0))
    pal = np.asarray(cost_volume_cw_pallas(*args, 5.0, interpret=True,
                                           pair=pair))
    np.testing.assert_allclose(pal, xla, atol=2e-6)
    assert np.abs(xla).max() > 0.1          # non-degenerate


@pytest.mark.parametrize("pair", [False, True])
def test_pallas_cv_matches_xla_bf16(pair):
    args = _inputs(seed=1)
    args = (args[0], args[1].astype(jnp.bfloat16),
            args[2].astype(jnp.bfloat16)) + args[3:]
    xla = np.asarray(cost_volume_cw(*args, 5.0))
    pal = np.asarray(cost_volume_cw_pallas(*args, 5.0, interpret=True,
                                           pair=pair))
    # Both paths round features to bf16; the pallas path additionally
    # rounds the bilinear weights (<= 2^-9 relative). Pixels sitting
    # exactly on the consistency threshold |z - mu| = kappa*sigma can
    # flip under that rounding (both paths are equally "right" there) —
    # allow a <0.5% flip fraction, tight tolerance elsewhere.
    diff = np.abs(pal - xla)
    flips = diff > 3e-2
    assert flips.mean() < 5e-3, f"{flips.mean():.4f} flip fraction"
    np.testing.assert_allclose(pal[~flips], xla[~flips], atol=3e-2)


def test_pallas_cv_out_of_image_zero():
    """Candidates projecting far outside the source view must contribute
    zero cost (grid_sample zeros padding), matching the XLA path."""
    args = list(_inputs(seed=2))
    # huge translation throws every projection out of frame
    args[6] = args[6] + 100.0
    xla = np.asarray(cost_volume_cw(*args, 5.0))
    pal = np.asarray(cost_volume_cw_pallas(*args, 5.0, interpret=True))
    np.testing.assert_allclose(pal, xla, atol=2e-6)
    assert np.abs(xla).max() < 1e-5


def test_pallas_cv_invalid_view_masked():
    args = list(_inputs(B=1, V=2, seed=3))
    all_valid = jnp.ones_like(args[7])
    one_off = all_valid.at[0, 1].set(0.0)
    a_on = args.copy(); a_on[7] = all_valid
    a_off = args.copy(); a_off[7] = one_off
    on = np.asarray(cost_volume_cw_pallas(*a_on, 5.0, interpret=True))
    off = np.asarray(cost_volume_cw_pallas(*a_off, 5.0, interpret=True))
    ref_off = np.asarray(cost_volume_cw(*a_off, 5.0))
    assert np.abs(on - off).max() > 1e-6    # masking does something
    np.testing.assert_allclose(off, ref_off, atol=2e-6)


def test_supported_gate():
    assert supported(None, 120, 160)
    assert supported(None, 88, 304)
    assert not supported(None, 12, 160)     # < band
    assert not supported(None, 121, 160)    # not tile-divisible


# ---- band-locality guard: degraded regime + fail-safe fallback --------
#
# A large in-plane roll makes the sampled source row sweep ~sin(roll) * W
# rows across each row-tile — far beyond the slab budget (band - 1 = 15
# rows; 2*c_rows - 2 = 6 for the pair kernel) — which is exactly the
# regime VERDICT r2 flagged as unvalidated: the kernel silently degrades
# out-of-slab samples to zero cost, diverging from homography.py:143-152.


def _degraded_inputs(B=1, V=2, H=24, W=64, C=8, D=5, seed=4, roll=0.6):
    args = list(_inputs(B=B, V=V, H=H, W=W, C=C, D=D, seed=seed,
                        motion=0.0))
    c, s = np.cos(roll), np.sin(roll)
    Rr = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    args[5] = jnp.asarray(np.tile(Rr, (B, V, 1, 1)))
    args[7] = jnp.ones((B, V), jnp.float32)
    return args


def _oob(args, pair):
    return np.asarray(cost_volume_cw_oob_fraction(
        args[0], args[5], args[6], args[8], args[9], args[7], pair=pair))


@pytest.mark.parametrize("pair", [False, True])
def test_oob_fraction_detects_degraded_regime(pair):
    args = _degraded_inputs()
    frac = _oob(args, pair)
    assert frac.max() > 1e-2, frac
    # and the kernel really does deviate from the exact path here
    xla = np.asarray(cost_volume_cw(*args, 5.0))
    pal = np.asarray(cost_volume_cw_pallas(*args, 5.0, interpret=True,
                                           pair=pair))
    assert np.abs(pal - xla).max() > 1e-3


@pytest.mark.parametrize("pair", [False, True])
def test_oob_fraction_zero_in_band(pair):
    args = _inputs()
    assert _oob(args, pair).max() == 0.0


@pytest.mark.parametrize("pair", [False, True])
def test_guarded_falls_back_to_exact_xla(pair):
    args = _degraded_inputs()
    xla = np.asarray(cost_volume_cw(*args, 5.0))
    guarded = np.asarray(cost_volume_cw_pallas_guarded(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3, interpret=True,
        pair=pair))
    np.testing.assert_allclose(guarded, xla, atol=1e-4)


@pytest.mark.parametrize("pair", [False, True])
def test_guarded_keeps_kernel_in_band(pair):
    args = _inputs()
    pal = np.asarray(cost_volume_cw_pallas(*args, 5.0, interpret=True,
                                           pair=pair))
    guarded = np.asarray(cost_volume_cw_pallas_guarded(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3, interpret=True,
        pair=pair))
    np.testing.assert_allclose(guarded, pal, atol=1e-4)


def _oob_band(args, pair, band):
    return float(cost_volume_cw_oob_fraction(
        args[0], args[5], args[6], args[8], args[9], args[7], band=band,
        pair=pair).max())


def _ladder(args, **kw):
    return np.asarray(cost_volume_cw_pallas_ladder(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3,
        steps=((True, 16), (False, 32)), interpret=True, **kw))


def test_ladder_escalates_to_wider_band():
    """Moderate roll: pair/band-16 coverage leaks, band-32 stays exact —
    the ladder must pick the band-32 kernel, not XLA."""
    args = _degraded_inputs(H=40, roll=0.3)
    assert _oob_band(args, True, 16) > 1e-3
    assert _oob_band(args, False, 32) <= 1e-3
    want = np.asarray(cost_volume_cw_pallas(*args, 5.0, band=32,
                                            pair=False, interpret=True))
    np.testing.assert_allclose(_ladder(args), want, atol=1e-4)


def test_ladder_final_fallback_is_xla():
    """Extreme roll exceeds every slab budget: ladder must produce the
    exact XLA result."""
    args = _degraded_inputs(H=40, roll=0.9)
    assert _oob_band(args, False, 32) > 1e-3
    want = np.asarray(cost_volume_cw(*args, 5.0))
    np.testing.assert_allclose(_ladder(args), want, atol=1e-4)


def test_ladder_fast_path_in_band():
    args = _inputs(B=1, H=40)   # H >= the widest ladder band (32)
    want = np.asarray(cost_volume_cw_pallas(*args, 5.0, band=16,
                                            pair=True, interpret=True))
    np.testing.assert_allclose(_ladder(args), want, atol=1e-4)


def test_guard_tol_cost_bound():
    """Pins the mechanism behind the measured guard-tolerance bound
    (benchmarks/cv_delta_bound.json, docs/KERNELS.md): (a) where the
    planner certifies exact coverage (frac = 0) the kernel matches the
    XLA path to f32 noise; (b) at the smallest achievable nonzero
    out-of-band fraction, the mean cost perturbation stays proportional
    to that fraction (each admitted sample loses at most its own cost),
    which is what makes tol=1e-3 imply a <=1.5e-4 depth abs_rel shift
    on the real-chip measurement."""
    lo, hi = 0.0, 1.2
    for _ in range(40):                   # bisect the coverage edge
        mid = 0.5 * (lo + hi)
        args = _degraded_inputs(H=48, roll=mid)
        if _oob_band(args, False, 32) == 0.0:
            lo = mid
        else:
            hi = mid

    exact = _degraded_inputs(H=48, roll=lo)
    assert _oob_band(exact, False, 32) == 0.0
    xla = np.asarray(cost_volume_cw(*exact, 5.0))
    pal = np.asarray(cost_volume_cw_pallas(*exact, 5.0, band=32,
                                           pair=False, interpret=True))
    assert np.abs(pal - xla).max() <= 1e-4

    beyond = _degraded_inputs(H=48, roll=hi)
    frac = _oob_band(beyond, False, 32)
    assert frac > 0.0
    xla_b = np.asarray(cost_volume_cw(*beyond, 5.0))
    pal_b = np.asarray(cost_volume_cw_pallas(*beyond, 5.0, band=32,
                                             pair=False, interpret=True))
    mean_delta = np.abs(pal_b - xla_b).mean()
    # V * frac of samples can each lose at most ~their own mean cost;
    # 4x margin over that proportionality
    V = beyond[2].shape[1]
    assert mean_delta <= 4.0 * V * frac * np.abs(xla_b).mean(), (
        mean_delta, frac)


def test_ladder_band48_rung():
    """A roll that leaks band-32 but fits band-48 must ride the band-48
    kernel (the round-4 rung that recovers ScanNet-normal motion) and
    match the exact XLA result."""
    args = _degraded_inputs(H=48, roll=0.45)
    assert _oob_band(args, False, 32) > 1e-3
    assert _oob_band(args, False, 48) <= 1e-3
    want = np.asarray(cost_volume_cw_pallas(*args, 5.0, band=48,
                                            pair=False, interpret=True))
    xla = np.asarray(cost_volume_cw(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas_ladder(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3,
        steps=((True, 16, 4), (False, 32), (False, 48)), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)
    np.testing.assert_allclose(got, xla, atol=1e-4)


def test_ladder_steps_defaults():
    """ladder_steps: the full-height (tall) pair rungs with 16/32/48-row
    free-offset windows replace the banded escalation where they fit the
    calibrated VMEM ceiling; block count follows the width's sublane
    alignment; f32 matching keeps only the 16-row window (wider windows
    measured slower than XLA); tiny shapes stay single-rung; and
    MAGNET_TPU_CV_LADDER overrides."""
    import os

    from magnet_tpu.ops.costvolume import ladder_steps
    assert ladder_steps(120, 160, 4) == (
        (True, 16, 4, 1), (True, 120, 8, 4), (True, 120, 16, 4),
        (True, 120, 24, 4))
    # KITTI width: 304/4 = 76 is not 8-sublane aligned -> 2 blocks; and
    # wide maps (W > 240) keep ONLY the 16-row window — the 32-row tall
    # rung measured 23.4 fps end-to-end, BELOW the full XLA escalation
    # (24.2), so escalating straight to XLA beats running it
    # (benchmarks/bench_motion_kitti.json, round 5)
    assert ladder_steps(88, 304, 2) == (
        (True, 16, 4, 1), (True, 88, 8, 2))
    # the tall slab is VIEW-INDEPENDENT (one resident map), so V=4 at
    # KITTI width — which excluded every V-resident banded rung — now
    # escalates through the same (width-pruned) tall rung
    assert ladder_steps(88, 304, 4) == (
        (True, 16, 4, 1), (True, 88, 8, 2))
    assert ladder_steps(16, 16, 2) == ((True, 16, 4, 1),)
    # f32 matching (--compute_dtype float32): only the 16-row window
    # stays ahead of the exact XLA path (see ladder_steps docstring)
    assert ladder_steps(120, 160, 4, itemsize=4) == (
        (True, 16, 4, 1), (True, 120, 8, 4))
    assert ladder_steps(120, 160, 2, itemsize=4) == (
        (True, 16, 4, 1), (True, 120, 8, 4))
    os.environ["MAGNET_TPU_CV_LADDER"] = "pair:16:8,band:32"
    try:
        assert ladder_steps(120, 160, 4) == ((True, 16, 8, 1),
                                             (False, 32, None, 1))
        # 4-field spec carries the column-block count
        os.environ["MAGNET_TPU_CV_LADDER"] = "pair:16:4,pair:48:16:2"
        assert ladder_steps(120, 160, 4) == ((True, 16, 4, 1),
                                             (True, 48, 16, 2))
    finally:
        del os.environ["MAGNET_TPU_CV_LADDER"]


_NARROW = ((True, 16, 4), (False, 32))   # production eval rung shape:
                                         # narrow 4-row pair slab first
                                         # (ops/costvolume.py), mixed
                                         # 3-/2-tuple steps


def test_ladder_narrow_pair_rows_in_band():
    """In-band frames ride the cheap narrow-slab rung and stay exact."""
    args = _inputs(B=1, H=40)
    want = np.asarray(cost_volume_cw(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas_ladder(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3, steps=_NARROW,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ladder_narrow_pair_rows_escalates():
    """A roll that leaks the 4-row pair slab must escalate (to band-32
    or XLA) and still produce the exact result."""
    args = _degraded_inputs(H=40, roll=0.3)
    want = np.asarray(cost_volume_cw(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas_ladder(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3, steps=_NARROW,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def _oob_blocks(args, band, rows, n_blocks):
    return float(cost_volume_cw_oob_fraction(
        args[0], args[5], args[6], args[8], args[9], args[7],
        band=band, pair=True, pair_rows=rows, n_blocks=n_blocks)[0])


def test_column_blocks_cover_lateral_shear():
    """Per-(pair, column-block) slab offsets: camera roll shears sampled
    rows ACROSS the tile width, which a full-width pair slab cannot
    cover; per-block offsets can. The block planner must (a) strictly
    reduce the out-of-band fraction under roll and (b) stay exact
    (vs the XLA path) when its coverage fraction is 0."""
    args = _degraded_inputs(H=32, W=64, roll=0.35)
    f1 = _oob_blocks(args, 16, 4, 1)
    f2 = _oob_blocks(args, 16, 4, 2)
    f4 = _oob_blocks(args, 16, 4, 4)
    assert f1 > 1e-3            # full-width pair slab leaks at this roll
    assert f2 < f1 and f4 <= f2

    # a milder roll where blocks are exact but the full-width pair is
    # not: shear span ~ W*sin(0.1) ~ 6.4 rows > the 6-row double slab of
    # rows=4; per 16-column block it is ~1.6 rows. band 32 keeps the
    # tile-level slab (which blocks cannot move) out of the way.
    args2 = _degraded_inputs(H=32, W=64, roll=0.1)
    assert _oob_blocks(args2, 32, 4, 1) > 0.0
    assert _oob_blocks(args2, 32, 4, 4) == 0.0
    want = np.asarray(cost_volume_cw(*args2, 5.0))
    got = np.asarray(cost_volume_cw_pallas(
        *args2, 5.0, band=32, pair=True, pair_rows=4, n_blocks=4,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_column_blocks_exact_in_band():
    """n_blocks > 1 must not perturb in-band results (any block split of
    an exactly-covered frame is still exactly covered)."""
    args = _inputs(B=2, V=2, H=24, W=32)
    want = np.asarray(cost_volume_cw(*args, 5.0))
    for nb in (2, 4):
        got = np.asarray(cost_volume_cw_pallas(
            *args, 5.0, pair=True, n_blocks=nb, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_ladder_block_rung_dispatch():
    """A ladder whose middle rung is a column-block pair kernel: a
    shear frame that leaks the full-width rung but is covered by the
    block rung must ride it and match the exact XLA result."""
    args = _degraded_inputs(H=32, W=64, roll=0.1)
    steps = ((True, 32, 4), (True, 32, 4, 4), (False, 32))
    assert _oob_blocks(args, 32, 4, 1) > 0.0
    assert _oob_blocks(args, 32, 4, 4) == 0.0
    want = np.asarray(cost_volume_cw(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas_ladder(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3, steps=steps,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tall_kernel_exact_and_batched():
    """Full-height rescue kernel (band == H: view axis in the grid, one
    resident view map, per-view outputs summed in XLA) must match the
    exact XLA path bit-for-bit (f32) on in-coverage frames, including
    B > 1 (per-(b, v) fetch) and invalid-view masking."""
    args = _inputs(B=2, V=3, H=32, W=32)
    want = np.asarray(cost_volume_cw(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas(
        *args, 5.0, band=32, pair=True, pair_rows=8, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-6)
    for nb in (2, 4):
        got = np.asarray(cost_volume_cw_pallas(
            *args, 5.0, band=32, pair=True, pair_rows=8, n_blocks=nb,
            interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_tall_kernel_free_offset_beats_banded():
    """The tall kernel's windows sit at UNRESTRICTED offsets: a frame
    whose per-pair footprints are small but scattered beyond any 16-row
    tile band (large roll at H=48) leaks the banded pair kernel yet is
    exactly covered — and matched — by the tall rung with the same
    window size."""
    args = _degraded_inputs(H=48, W=64, roll=0.35)

    def frac(band, rows, nb):
        return float(cost_volume_cw_oob_fraction(
            args[0], args[5], args[6], args[8], args[9], args[7],
            band=band, pair=True, pair_rows=rows, n_blocks=nb)[0])

    assert frac(16, 8, 4) > 1e-3        # banded pair leaks at this roll
    assert frac(48, 8, 4) == 0.0        # tall (band == H): free offsets
    want = np.asarray(cost_volume_cw(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas(
        *args, 5.0, band=48, pair=True, pair_rows=8, n_blocks=4,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ladder_tall_rung_dispatch():
    """A ladder whose rescue rung is the tall kernel: a frame leaking
    the banded rung must ride the tall rung (not XLA) and match."""
    args = _degraded_inputs(H=48, W=64, roll=0.35)
    steps = ((True, 16, 8, 4), (True, 48, 8, 4))
    got = np.asarray(cost_volume_cw_pallas_ladder(
        *args, 5.0, xla_fn=_cost_volume_cw_xla, tol=1e-3, steps=steps,
        interpret=True))
    want = np.asarray(cost_volume_cw(*args, 5.0))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batched_kernel_gate():
    """Engagement policy for B > 1 (cost_volume_cw): caller-declared
    default (train entries set it from mesh.size) with env override."""
    import os
    from magnet_tpu.ops import costvolume as cvmod

    saved_flag = cvmod._BATCHED_KERNEL_DEFAULT
    saved_env = os.environ.pop("MAGNET_TPU_PALLAS_CV_BATCH", None)
    try:
        assert cvmod._batched_kernel_ok(1)          # B == 1 always
        cvmod.set_batched_kernel_default(False)
        assert not cvmod._batched_kernel_ok(2)
        cvmod.set_batched_kernel_default(True)      # single-device mesh
        assert cvmod._batched_kernel_ok(2)
        os.environ["MAGNET_TPU_PALLAS_CV_BATCH"] = "0"   # env wins
        assert not cvmod._batched_kernel_ok(2)
        cvmod.set_batched_kernel_default(False)
        os.environ["MAGNET_TPU_PALLAS_CV_BATCH"] = "1"
        assert cvmod._batched_kernel_ok(2)
    finally:
        cvmod.set_batched_kernel_default(saved_flag)
        if saved_env is None:
            os.environ.pop("MAGNET_TPU_PALLAS_CV_BATCH", None)
        else:
            os.environ["MAGNET_TPU_PALLAS_CV_BATCH"] = saved_env


def _full_rot(rng, mag):
    """Random xyz rotation with angles ~ U(-mag, mag) — includes roll
    (about the optical axis), the hardest case for row-slab coverage."""
    ax, ay, az = rng.uniform(-mag, mag, 3)

    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float32)

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    return (rz(az) @ ry(ay) @ rx(ax)).astype(np.float32)


def _motion_inputs(H, W, V, mag, seed):
    """Plan-relevant inputs only (poses/intrinsics/candidates) at a given
    motion magnitude (radians of xyz rotation AND meters of translation)."""
    rng = np.random.RandomState(seed)
    R = np.stack([_full_rot(rng, mag) for _ in range(V)])[None]
    t = rng.uniform(-mag * 4, mag * 4, (1, V, 3)).astype(np.float32)
    valid = np.ones((1, V), np.float32)
    fx = 0.9 * W
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1.0]], np.float32)
    grid = np.ones((H, W, 3), np.float32)
    grid[:, :, 0] = (np.arange(W)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(H)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(1, 3, -1)
    dvol = rng.uniform(1, 5, (1, H, W, 5)).astype(np.float32)
    return (jnp.asarray(dvol), jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(np.tile(K, (1, 1, 1))), jnp.asarray(rays),
            jnp.asarray(valid))


@pytest.mark.parametrize("H,W,V", [(32, 64, 2), (64, 128, 4),
                                   (120, 160, 4), (88, 312, 2)])
def test_ladder_admission_nests(H, W, V):
    """docs/KERNELS.md claims the production ladder's admission sets NEST:
    any frame rung i admits (out-of-band fraction <= tol), every later
    rung admits too — so escalation can never skip past the only exact
    rung. Checked as a property over the ACTUAL ladder_steps rung list
    for a sweep of motion regimes (xyz rotations incl. roll + fresh
    translations): the oob fraction is monotonically non-increasing down
    the ladder."""
    from magnet_tpu.ops.costvolume import (_CV_GUARD_DEFAULT_TOL,
                                           ladder_steps)

    for itemsize in (2, 4):
        steps = ladder_steps(H, W, V, itemsize=itemsize)
        assert len(steps) >= 1
        for mag in (0.002, 0.01, 0.04, 0.12):
            for seed in (0, 1):
                dvol, R, t, intM, rays, valid = _motion_inputs(
                    H, W, V, mag, seed)
                fracs = []
                for (p, b, rows, blocks) in ((tuple(s) + (None, 1))[:4]
                                             for s in steps):
                    f = cost_volume_cw_oob_fraction(
                        dvol, R, t, intM, rays, valid, band=b, pair=p,
                        pair_rows=rows, n_blocks=blocks or 1)
                    fracs.append(float(f[0]))
                for i in range(len(fracs) - 1):
                    assert fracs[i + 1] <= fracs[i] + 1e-9, (
                        f"rung {i + 1} covers LESS than rung {i}: "
                        f"{fracs} steps={steps} mag={mag} seed={seed} "
                        f"itemsize={itemsize}")
                # Admission nesting at the production tolerance follows
                # from monotonicity; assert it directly too.
                admitted = [f <= _CV_GUARD_DEFAULT_TOL for f in fracs]
                for i in range(len(admitted) - 1):
                    assert (not admitted[i]) or admitted[i + 1], (
                        fracs, steps)


@pytest.mark.parametrize("W", [128, 24])
def test_band_equals_h_dispatch_gated(W):
    """band == H reaches _cost_volume_batched's tall branch only through
    tall_supported (advisor r4): W=128 satisfies the (c_rows*W) % 128
    alignment and runs the tall kernel; W=24 fails it and must fall back
    to the banded kernel instead of an unguarded tall compile. Both must
    match the XLA path exactly in f32."""
    H, V = 16, 2
    args = _inputs(B=1, V=V, H=H, W=W, C=8, D=3, seed=7)
    want = np.asarray(_cost_volume_cw_xla(*args, 5.0))
    got = np.asarray(cost_volume_cw_pallas(*args, 5.0, band=H,
                                           interpret=True, pair=True))
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert np.abs(want).max() > 0.01

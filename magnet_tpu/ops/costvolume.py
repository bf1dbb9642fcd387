"""Plane-sweep cost volumes, fully vectorized for XLA/TPU.

The geometry core of MaGNet. Two variants mirroring the reference
(models/submodules/homography.py):

* ``cost_volume_sweep`` — fixed D-plane sweep for F-Net training
  (est_costvolume_F, homography.py:10-75): project each sweep plane into
  every source view, warp source features, channel dot-product, average over
  views, softmax over planes.

* ``cost_volume_cw`` — per-pixel Gaussian-sampled candidates with
  consistency weighting (est_costvolume_CW, homography.py:79-161): each
  candidate's matching score is zeroed where the candidate's depth in the
  source camera disagrees with the source view's own single-view Gaussian
  (|z - mu_src| >= kappa * sigma_src).

TPU-first design notes (vs the reference's python loops):
  - The reference loops over batch and view in python with a per-view
    `.item()` host sync (homography.py:21-30,88-97). Here everything is a
    single traced program: batch and view are vmapped, validity is a
    multiplicative mask, and candidates are a tensor axis.
  - Feature, mu and sigma maps of a source view are concatenated on the
    channel axis so each (view, candidate) needs ONE bilinear gather instead
    of three (homography.py:150-152 does three grid_samples).
  - All geometry runs in float32 (projective division + thresholding are
    precision sensitive); the feature dot-product can run in bf16.

Layouts are NHWC: features (B, H, W, C); cost volumes (B, H, W, D).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from magnet_tpu.ops.resample import (bilinear_gather_block as
                                     bilinear_gather, gather_corner_block)


def _use_pallas_cv() -> bool:
    """The fused Pallas kernel (kernels/costvolume_pallas.py) replaces the
    XLA gather path on TPU (~3x faster; golden-tested equal). Env override
    MAGNET_TPU_PALLAS_CV=0/1 forces either path."""
    env = os.environ.get("MAGNET_TPU_PALLAS_CV", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"


# Default out-of-band sample tolerance for the kernel guard: the Pallas
# kernel is exact at fraction 0 (in-band regimes measure exactly 0.0, see
# scripts/cv_motion_sweep.py); degraded samples lose cost toward zero —
# the same direction as leaving the frame — so a <=0.1% sample fraction is
# bounded well inside the consistency-mask noise floor while avoiding
# whole-frame fallback on a handful of edge pixels.
_CV_GUARD_DEFAULT_TOL = 1e-3


def _cv_guard_tol():
    """MAGNET_TPU_CV_GUARD: '0'/'off' disables the guard (kernel always
    runs, round-2 behavior); a float sets the out-of-band sample tolerance;
    default 1e-3. Returns None when disabled."""
    env = os.environ.get("MAGNET_TPU_CV_GUARD", "").strip().lower()
    if env in ("0", "off", "false"):
        return None
    if not env or env in ("1", "on", "true"):
        return _CV_GUARD_DEFAULT_TOL
    return float(env)

# Caller-declared safety of the batched (B > 1) Pallas kernel; see the
# engagement policy in cost_volume_cw. MAGNET_TPU_PALLAS_CV_BATCH, when
# set, wins over this flag.
_BATCHED_KERNEL_DEFAULT = False


def set_batched_kernel_default(on: bool) -> None:
    """Declare whether the batched (B > 1) Pallas cost volume may engage
    by default. Train entry points call this with `mesh.size == 1`: on a
    single-device mesh the GSPMD-replication concern is vacuous and the
    kernel is a measured +21% on the MaGNet train step.

    MUST be called BEFORE the first trace of any step that reaches
    cost_volume_cw: the flag is read at trace time and is not part of any
    jit cache key, so flipping it after a step has been traced silently
    has no effect on that step (and flipping it between calls of the same
    signature will not retrigger tracing). Library users who need
    per-call control should set MAGNET_TPU_PALLAS_CV_BATCH and manage
    their own jit boundaries instead."""
    global _BATCHED_KERNEL_DEFAULT
    _BATCHED_KERNEL_DEFAULT = bool(on)


def _batched_kernel_ok(B: int) -> bool:
    """Gate for engaging the Pallas kernel at this batch size (see the
    engagement-policy comment in cost_volume_cw). Env wins over the
    caller-declared default."""
    if B == 1:
        return True
    env = os.environ.get("MAGNET_TPU_PALLAS_CV_BATCH", "")
    if env in ("0", "1"):
        return env == "1"
    return _BATCHED_KERNEL_DEFAULT


# Slab VMEM budget for adding wider full-band rungs to the ladder: the
# kernel's packed-source scratch is (V, band, W, 128) bf16, and Mosaic
# needs ~6.5 MB more for the pipelined weight transients. Measured on
# v5e (probe, round 4): band 48 at V=4, W=160 (7.9 MB slab) compiles and
# runs; band 64 (10.5 MB) fails scoped-VMEM compile.
_SLAB_BUDGET_BYTES = 8.5e6


def ladder_steps(H: int, W: int, V: int, itemsize: int = 2):
    """The production escalation-ladder rung list for this shape: tuples
    (pair, band, pair_rows, n_blocks), cheapest first; the exact XLA
    path is the implicit final rung. Shared by the dispatch below and
    the motion-regime bench (scripts/bench_motion.py) so they can never
    disagree about what runs.

    Rung choice is measurement-driven (scripts/cv_motion_sweep.py
    --ladder, docs/KERNELS.md): the narrow pair slab covers near-static
    frames (the serving steady state); the escalation rungs are the
    FULL-HEIGHT pair kernels (_kernel_pair_tall: band == H, one view
    map resident in VMEM, per-(pair, column-block) windows of
    2*pair_rows rows at UNRESTRICTED offsets) with growing window
    sizes 16/32/48. Admission nests by window size alone (a window that
    fits in a rung's 2r rows fits in any wider rung's), and the widest
    rung (48-row windows) also admits everything the retired full-band
    48 kernel admitted — any tile footprint <= 47 dense rows fits one
    free 48-row window per pair — while measuring FASTER (4.77 vs
    5.50 ms isolated) because the resident view map cuts slab DMA
    ~60x. Where the tall rung is infeasible (tall_supported: VMEM
    estimate vs the calibrated ceiling — e.g. KITTI width excludes the
    48-row window; tiny test shapes) the pre-round-4 banded rungs are
    the fallback. MAGNET_TPU_CV_LADDER overrides with a comma list of
    pair:band[:rows[:blocks]] | band:band specs (band == H selects the
    tall kernel).

    ``itemsize`` is the matching dtype's byte width: f32 matching
    (--compute_dtype float32, the bit-parity mode) doubles the slab AND
    quadruples the MXU contraction cost (HIGHEST precision), so only
    the 16-row-window tall rung stays ahead of the exact XLA path
    (measured 2.94 vs 5.04 ms; the 32/48-row windows lose at 6.74/8.64)
    — wider escalation falls through to XLA, which is exact anyway."""
    from magnet_tpu.kernels import costvolume_pallas as cvp

    env = os.environ.get("MAGNET_TPU_CV_LADDER", "").strip()
    if env:
        steps = []
        for spec in env.split(","):
            f = spec.strip().split(":")
            pair = {"pair": True, "band": False}[f[0]]
            steps.append((pair, int(f[1]),
                          int(f[2]) if len(f) > 2 else None,
                          int(f[3]) if len(f) > 3 else 1))
        return tuple(steps)

    band = int(os.environ.get("MAGNET_TPU_CV_BAND", cvp.DEFAULT_BAND))
    pair = cvp.use_pair_kernel()
    rows1 = ((cvp.pair_rows_env() or 4) if pair else None)
    steps = [(pair, band, rows1, 1)]
    nb = next((n for n in (4, 2) if cvp.blocks_supported(W, n)), 1)
    # f32 matching (bit-parity mode): HIGHEST-precision MXU contraction
    # costs ~4x bf16 per MAC, and the measured r16/r24 tall rungs land
    # SLOWER than the XLA gather path (6.74/8.64 vs 5.04 ms at the
    # ScanNet V=2 f32 shape) — only the narrowest window stays ahead.
    # Wide maps (KITTI W=304, round-5 measurement): the r16 window's
    # per-pair chunk scales with W and the rung lands BELOW the full
    # XLA escalation (23.4 vs 24.1 fps end-to-end), so escalating
    # straight to XLA is faster than running it — wide shapes keep
    # only the 16-row window (30.2 fps rung).
    if itemsize >= 4:
        tall_rows = (8,)
    elif W > 240:
        tall_rows = (8,)
    else:
        tall_rows = (8, 16, 24)
    tall = [r for r in tall_rows if H > band
            and cvp.tall_supported(H, W, r, nb, itemsize)]
    if pair and tall:
        steps += [(True, H, r, nb) for r in tall]
        return tuple(steps)
    block_rung = (pair and nb > 1 and H >= 48 and 48 > band
                  and V * 48 * W * 128 * itemsize <= _SLAB_BUDGET_BYTES)
    if block_rung:
        steps.append((True, 48, 16, nb))
    rescue = [48] if block_rung else sorted({max(32, 2 * band), 48})
    for b in rescue:
        if b <= band or H < b:
            continue
        if V * b * W * 128 * itemsize > _SLAB_BUDGET_BYTES:
            continue
        steps.append((False, b, None, 1))
    return tuple(steps)


_EPS_DIV = 1e-10
_COORD_CLIP = 10.0
# Projective geometry must not run through the MXU's bf16 truncation —
# a 0.1-pixel coordinate error shifts every warp. These matmuls are tiny
# (3x3 @ 3xHW); full f32 precision costs nothing.
_HI = jax.lax.Precision.HIGHEST


def _project_pts(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                 rays: jnp.ndarray, d: jnp.ndarray, H: int, W: int):
    """Project candidate depths for an arbitrary pixel set.

    K: (3, 3); R: (3, 3); t: (3,); rays: (3, N); d: (..., N) depths
    (broadcastable against N). Returns x, y (grid_sample index space,
    sample position u - 0.5) and z (depth in the source camera), each of
    d's shape. H/W only set the normalization frame."""
    Rrays = jnp.matmul(R, rays, precision=_HI)              # (3, N)
    term1_pix = jnp.matmul(K, t[:, None], precision=_HI)    # (3, 1)
    term2_pix = jnp.matmul(K, Rrays, precision=_HI)         # (3, N)

    P0 = term1_pix[0] + term2_pix[0] * d
    P1 = term1_pix[1] + term2_pix[1] * d
    P2 = term1_pix[2] + term2_pix[2] * d
    z = t[2] + Rrays[2] * d

    denom = P2 + _EPS_DIV
    u = P0 / denom
    v = P1 / denom

    # Normalize exactly like the reference (homography.py:143-148): center
    # at (W/2, H/2), clip to +-10 in normalized units...
    gx = jnp.clip((u - W / 2.0) / (W / 2.0), -_COORD_CLIP, _COORD_CLIP)
    gy = jnp.clip((v - H / 2.0) / (H / 2.0), -_COORD_CLIP, _COORD_CLIP)
    # ...then unnormalize into align_corners=False index space: x = u - 0.5.
    x = ((gx + 1.0) * W - 1.0) * 0.5
    y = ((gy + 1.0) * H - 1.0) * 0.5
    return x, y, z


def _project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
             rays2d: jnp.ndarray, d: jnp.ndarray, H: int, W: int):
    """Project per-pixel candidate depths into a source view.

    K: (3, 3) dpv intrinsics; R: (3, 3); t: (3,); rays2d: (3, H*W);
    d: (D, H, W) candidate depths.
    Returns (x, y) pixel coords of shape (D, H, W) — in grid_sample index
    space (sample position u - 0.5) — and z (D, H, W), the candidate's depth
    in the source camera.
    """
    D = d.shape[0]
    x, y, z = _project_pts(K, R, t, rays2d, d.reshape(D, H * W), H, W)
    return (x.reshape(D, H, W), y.reshape(D, H, W), z.reshape(D, H, W))


def make_matching_queries(ref_feat: jnp.ndarray, matching_dtype):
    """Query columns for the corner-block contraction: the reference
    feature (-> matching cost) plus one-hot selectors for the packed
    mu/sigma channels (-> warped mu/sigma). Built ONCE per forward — it is
    view- and iteration-invariant. ref_feat: (H, W, C) -> (H, W, C+2, 3).
    """
    H, W, C = ref_feat.shape
    sel = jnp.zeros((H, W, 2, 2), matching_dtype)
    sel = sel.at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    return jnp.concatenate([
        jnp.concatenate([ref_feat.astype(matching_dtype),
                         jnp.zeros((H, W, 2), matching_dtype)],
                        axis=-1)[..., None],                # (H,W,C+2,1)
        jnp.concatenate([jnp.zeros((H, W, C, 2), matching_dtype), sel],
                        axis=-2),                           # (H,W,C+2,2)
    ], axis=-1)                                             # (H,W,C+2,3)


def _cost_one_view_cw(queries, src_feat, src_mu, src_sigma,
                      d_volume, K, R, t, rays2d, valid, kappa,
                      matching_dtype=jnp.float32):
    """Consistency-weighted matching cost of one (batch, view) pair.

    queries: (H, W, C+2, 3) from make_matching_queries; src_feat:
    (H, W, C); src_mu/src_sigma: (H, W) f32; d_volume: (D, H, W);
    valid: scalar {0,1}. Returns (D, H, W) f32.

    One corner-block gather per (candidate, pixel) fetches features AND
    (mu, sigma) in matching_dtype. With bf16, mu/sigma carry ~8 mantissa
    bits (~0.02 m at indoor depths) against consistency thresholds of
    kappa*sigma >= ~0.5 m — only pixels exactly on the threshold boundary
    can flip; run --compute_dtype float32 for bit-level reference parity.
    The corner dot-product accumulates in f32 before the bilinear
    combine, so combined feature maps are never materialized.
    """
    H, W = src_feat.shape[:2]
    x, y, z = _project(K, R, t, rays2d, d_volume, H, W)

    ms = jnp.stack([src_mu, src_sigma], axis=-1)
    packed = jnp.concatenate(
        [src_feat, ms.astype(src_feat.dtype)],
        axis=-1).astype(matching_dtype)                     # (H, W, C+2)

    block, w = gather_corner_block(packed, x, y)     # (D,H,W,2,2,C+2)

    if matching_dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
        # CPU XLA lacks bf16 x bf16 -> f32 dots; values are already
        # bf16-rounded so computing in f32 preserves the semantics.
        block = block.astype(jnp.float32)
        queries = queries.astype(jnp.float32)
    corner = jnp.einsum("dhwyxc,hwcm->dhwyxm", block, queries,
                        preferred_element_type=jnp.float32,
                        precision=None if matching_dtype == jnp.bfloat16
                        else _HI)
    combined = jnp.einsum("dhwyx,dhwyxm->dhwm", w, corner,
                          precision=_HI)                    # (D,H,W,3)

    feat_cost = combined[..., 0]
    w_mu = combined[..., 1]
    w_sigma = combined[..., 2]

    depth_diff = jnp.abs(z - w_mu)
    consistent = (depth_diff < w_sigma * kappa).astype(feat_cost.dtype)
    return feat_cost * consistent * valid


def _cost_one_view_sweep(ref_feat, src_feat, d_center, K, R, t, rays2d,
                         valid, matching_dtype=jnp.float32):
    """Fixed-sweep matching cost of one (batch, view) pair.
    d_center: (D,) sweep depths. Returns (D, H, W)."""
    H, W, C = ref_feat.shape
    D = d_center.shape[0]
    d_volume = jnp.broadcast_to(d_center[:, None, None], (D, H, W))
    x, y, _ = _project(K, R, t, rays2d, d_volume, H, W)
    block, w = gather_corner_block(
        src_feat.astype(matching_dtype), x, y)       # (D,H,W,2,2,C)
    corner = jnp.einsum("dhwyxc,hwc->dhwyx", block,
                        ref_feat.astype(block.dtype),
                        preferred_element_type=jnp.float32,
                        precision=None if matching_dtype == jnp.bfloat16
                        else _HI)
    feat_cost = jnp.sum(w * corner, axis=(-1, -2))
    return feat_cost * valid


def cost_volume_cw(d_volume: jnp.ndarray, ref_feat: jnp.ndarray,
                   src_feat: jnp.ndarray, src_mu: jnp.ndarray,
                   src_sigma: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                   is_valid: jnp.ndarray, intM: jnp.ndarray,
                   rays2d: jnp.ndarray, kappa: float) -> jnp.ndarray:
    """Consistency-weighted cost volume (est_costvolume_CW parity).

    d_volume:  (B, H, W, D) per-pixel candidate depths
    ref_feat:  (B, H, W, C)
    src_feat:  (B, V, H, W, C)
    src_mu:    (B, V, H, W) single-view depth means of source views
    src_sigma: (B, V, H, W) single-view depth stdevs of source views
    R: (B, V, 3, 3); t: (B, V, 3); is_valid: (B, V)
    intM: (B, 3, 3); rays2d: (B, 3, H*W); kappa: consistency threshold.

    Returns (B, H, W, D) — sum over valid views divided by V (the reference
    divides by the static view count, homography.py:120).
    """
    B, H, W, D = d_volume.shape

    # The kernel grid carries the batch axis (B, tiles, D), so any B is
    # supported. Engagement policy: B == 1 (the eval/serving protocol,
    # test_MaGNet.py:36 — and the per-device shape under the multi-stream
    # shard_map) always; B > 1 when the caller has declared it safe via
    # set_batched_kernel_default (train entry points do, when their mesh
    # is single-device: +21% train step, 26.9 -> 32.5 samples/s/chip at
    # batch 2, scripts/bench_train.py) or MAGNET_TPU_PALLAS_CV_BATCH=1.
    # Default-off otherwise because a pallas_call inside an
    # XLA-auto-sharded (GSPMD) train step would force its operands
    # replicated across the mesh — explicitly shard_mapped callers see
    # per-shard B == 1 and never reach this branch.
    batch_ok = _batched_kernel_ok(B)
    if batch_ok and _use_pallas_cv():
        from magnet_tpu.kernels import costvolume_pallas as cvp
        # MAGNET_TPU_CV_BAND widens the first rung's row-slab budget
        # (VMEM permitting) for high-parallax regimes; MAGNET_TPU_CV_PAIR
        # picks its kernel variant (see use_pair_kernel);
        # MAGNET_TPU_CV_LADDER overrides the whole rung list.
        V = src_feat.shape[1]
        mdt_size = 2 if src_feat.dtype == jnp.bfloat16 else 4
        steps = ladder_steps(H, W, V, itemsize=mdt_size)
        pair1, band, rows1, blocks1 = (tuple(steps[0]) + (None, 1))[:4]
        if cvp.supported(d_volume, H, W, band=band):
            args = (d_volume, ref_feat, src_feat, src_mu, src_sigma, R, t,
                    is_valid, intM, rays2d, kappa)
            tol = _cv_guard_tol()
            if tol is None:
                return cvp.cost_volume_cw_pallas(*args, band=band,
                                                 pair=pair1,
                                                 pair_rows=rows1,
                                                 n_blocks=blocks1 or 1)
            # Escalation ladder (ladder_steps): cheapest exact variant
            # per frame — narrow pair(band) -> column-block pair(48) ->
            # full-band 48 where it fits VMEM -> XLA. Rung 1 uses the
            # NARROW 4-row
            # pair slab: it is ~2x cheaper than the 8-row variant and
            # coverage only decides which rung runs, never correctness —
            # static/slow frames (the serving steady state) ride it,
            # frames it cannot cover exactly escalate. Measured rung
            # occupancy per motion regime: docs/KERNELS.md.
            return cvp.cost_volume_cw_pallas_ladder(
                *args, xla_fn=_cost_volume_cw_xla, tol=tol, steps=steps)

    return _cost_volume_cw_xla(d_volume, ref_feat, src_feat, src_mu,
                               src_sigma, R, t, is_valid, intM, rays2d,
                               kappa)


def _cost_volume_cw_xla(d_volume, ref_feat, src_feat, src_mu, src_sigma,
                        R, t, is_valid, intM, rays2d, kappa):
    """The exact XLA corner-gather path (reference semantics); also the
    guard's fallback branch."""
    B, H, W, D = d_volume.shape
    V = src_feat.shape[1]
    f32 = jnp.float32
    # Features match in bf16 when the backbone runs in bf16; geometry and
    # the consistency check always stay f32.
    mdt = jnp.bfloat16 if src_feat.dtype == jnp.bfloat16 else f32

    dvol = jnp.moveaxis(d_volume, -1, 1).astype(f32)        # (B, D, H, W)

    def per_batch(dvol_b, ref_b, srcf_b, mu_b, sig_b, R_b, t_b, val_b,
                  K_b, rays_b):
        queries = make_matching_queries(ref_b, mdt)   # shared by all views

        def per_view(srcf_v, mu_v, sig_v, R_v, t_v, val_v):
            return _cost_one_view_cw(
                queries, srcf_v, mu_v.astype(f32),
                sig_v.astype(f32), dvol_b, K_b.astype(f32), R_v.astype(f32),
                t_v.astype(f32), rays_b.astype(f32), val_v.astype(f32),
                kappa, matching_dtype=mdt)
        costs = jax.vmap(per_view)(srcf_b, mu_b, sig_b, R_b, t_b, val_b)
        return jnp.sum(costs, axis=0)                       # (D, H, W)

    cost = jax.vmap(per_batch)(dvol, ref_feat, src_feat, src_mu, src_sigma,
                               R, t, is_valid, intM, rays2d)
    cost = cost / float(V)
    return jnp.moveaxis(cost, 1, -1)                        # (B, H, W, D)


def cost_volume_sweep(d_center: jnp.ndarray, ref_feat: jnp.ndarray,
                      src_feat: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                      is_valid: jnp.ndarray, intM: jnp.ndarray,
                      rays2d: jnp.ndarray) -> jnp.ndarray:
    """Fixed-sweep cost volume (est_costvolume_F parity).

    d_center: (D,) sweep plane depths; other args as in `cost_volume_cw`.
    Returns (B, H, W, D), softmaxed over D (homography.py:45-46).
    """
    B, V = src_feat.shape[:2]
    D = d_center.shape[0]
    H, W, C = ref_feat.shape[1:]
    f32 = jnp.float32
    d_center = d_center.astype(f32)
    mdt = jnp.bfloat16 if src_feat.dtype == jnp.bfloat16 else f32

    if os.environ.get("MAGNET_TPU_SWEEP_BWD", "win") == "xla":
        # Debug/reference escape: plain autodiff through the gather —
        # its backward lowers to XLA scatter, which TPU SERIALIZES
        # per-index (measured 32.6 s for a 4-(batch,view)-pair backward
        # at the F-Net training shape, and >=8 pairs exceeds the
        # runtime's execution limit, crashing the worker). Small shapes
        # only; the default path below fixes this.
        cost = _sweep_pre_cost_impl(d_center, ref_feat, src_feat, R, t,
                                    is_valid, intM, rays2d,
                                    allow_kernel=False)
    else:
        cost = _sweep_pre_cost(d_center, ref_feat, src_feat, R, t,
                               is_valid, intM, rays2d)
    cost = cost / float(V)
    cost = jax.nn.softmax(cost, axis=1)                     # over D
    return jnp.moveaxis(cost, 1, -1)


def _sweep_matching_dtype(src_feat):
    mdt = jnp.bfloat16 if src_feat.dtype == jnp.bfloat16 else jnp.float32
    if mdt == jnp.bfloat16 and jax.default_backend() == "cpu":
        return jnp.float32          # CPU XLA lacks bf16 dots
    return mdt


def _sweep_pre_cost_impl(d_center, ref_feat, src_feat, R, t, is_valid,
                         intM, rays2d, allow_kernel: bool = True):
    """Pre-softmax sweep cost (B, D, H, W) f32 = sum over valid views of
    the per-view matching cost (NOT yet divided by V).

    Kernel route: with the consistency check disabled (mu = 0,
    sigma = 1e30 -> |z| < kappa*sigma always true for in-image samples;
    out-of-image samples interpolate sigma to 0 and zero out, exactly
    the gather path's zero-padding), ``cost_volume_cw`` IS the sweep
    pre-cost times 1/V — so on TPU the fixed sweep rides the SAME fused
    Pallas cost-volume kernels (and exactness ladder) as the
    consistency-weighted volume. ``allow_kernel=False`` (the autodiff
    escape path) keeps the differentiable gather.

    Gather-path memory shape: the corner-block gather materializes
    (d, H, W, 2, 2, C) in f32 before the contraction. At the F-Net
    TRAINING shape (D=80 sweep planes, 120x160, C=64) a fully vmapped
    (B, V, D) evaluation transiently allocates ~25 GB and fails HBM
    (caught by scripts/bench_train.py --stage 2). The D axis therefore
    runs SEQUENTIALLY in chunks (lax.map -> device loop) under the
    (B, V) vmaps, bounding the transient to B*V x one chunk. Per-chunk
    MXU work stays large, so the loop costs dispatch, not utilization."""
    B, V = src_feat.shape[:2]
    D = d_center.shape[0]
    H, W, C = ref_feat.shape[1:]
    f32 = jnp.float32
    d_center = d_center.astype(f32)
    mdt = _sweep_matching_dtype(src_feat)

    # MEASURED DEAD-END (round 5, kept as a note): routing this forward
    # through the CW Pallas kernels (mu = 0, sigma = 1e30 disables the
    # consistency check — the identity is real and pinned by
    # tests/test_costvolume.py::test_sweep_forward_rides_cw_kernel)
    # cannot compile at the sweep's D = 80: the kernels scalar-prefetch
    # their per-(d, tile[, pair]) plan arrays into SMEM, and at D = 80
    # the request measured 5 MB against the 1 MB scalar space — with
    # the tall rungs excluded AND banded nb == 1 rungs only, alike. The
    # chunked gather below stays the forward; `allow_kernel` is kept
    # for a future kernel whose plans ride VMEM instead of SMEM.

    env_chunk = os.environ.get("MAGNET_TPU_SWEEP_CHUNK", "")
    if env_chunk:
        chunk = int(env_chunk)
    else:
        per_d = max(1, B * V * H * W * 2 * 2 * C * 4)
        chunk = max(1, int(3.0e9 // per_d))
    chunk = next((c for c in range(min(chunk, D), 0, -1) if D % c == 0),
                 1)
    d_chunks = d_center.reshape(-1, chunk)

    def per_batch(ref_b, srcf_b, R_b, t_b, val_b, K_b, rays_b):
        def per_view(srcf_v, R_v, t_v, val_v):
            @jax.checkpoint
            def do_chunk(dc):
                return _cost_one_view_sweep(
                    ref_b, srcf_v, dc, K_b.astype(f32), R_v.astype(f32),
                    t_v.astype(f32), rays_b.astype(f32),
                    val_v.astype(f32), matching_dtype=mdt)
            return jax.lax.map(do_chunk, d_chunks).reshape(
                (D,) + ref_b.shape[:2])
        costs = jax.vmap(per_view)(srcf_b, R_b, t_b, val_b)
        return jnp.sum(costs, axis=0)

    return jax.vmap(per_batch)(ref_feat, src_feat, R, t, is_valid,
                               intM, rays2d)


@jax.custom_vjp
def _sweep_pre_cost(d_center, ref_feat, src_feat, R, t, is_valid, intM,
                    rays2d):
    """_sweep_pre_cost_impl with a TPU-native hand-written backward.

    Autodiff's backward for the bilinear gather is an XLA scatter-add,
    which the TPU backend SERIALIZES into a per-index loop: measured
    32.6 s of device time for ONE 4-pair backward at the F-Net training
    shape, and any program with >= 8 (batch, view) pairs of scatter
    work exceeded the runtime execution limit and crashed the TPU
    worker — F-Net training at the reference protocol (B=2, V=4) was
    IMPOSSIBLE through autodiff. The custom backward below replaces the
    scatter with the transpose of the windowed-matmul structure the
    forward Pallas kernels use (free-offset row windows per (plane,
    ref-row-pair), MXU contraction + dense dynamic-update-slice
    accumulation in a scan): no scatter instruction anywhere.
    """
    return _sweep_pre_cost_impl(d_center, ref_feat, src_feat, R, t,
                                is_valid, intM, rays2d)


def _sweep_pre_cost_fwd(d_center, ref_feat, src_feat, R, t, is_valid,
                        intM, rays2d):
    cost = _sweep_pre_cost_impl(d_center, ref_feat, src_feat, R, t,
                                is_valid, intM, rays2d)
    return cost, (d_center, ref_feat, src_feat, R, t, is_valid, intM,
                  rays2d)


def _sweep_bwd_rows(H: int) -> int:
    """Half-window height of the backward's free-offset row windows
    (window = 2*rows source rows per (plane, ref-row-pair)). Footprints
    taller than the window lose their gradient contributions — the same
    band-locality trade the forward kernels make, except the backward
    window has a FREE offset (band == H semantics), so it admits
    everything the 16-row tall rung admits; at training-protocol motion
    (ScanNet window radius 20) coverage is exact
    (tests/test_costvolume.py::test_sweep_bwd_matches_autodiff)."""
    rows = int(os.environ.get("MAGNET_TPU_SWEEP_BWD_ROWS", "8"))
    return max(1, min(rows, H // 2))


def _sweep_pre_cost_bwd(res, gbar):
    d_center, ref_feat, src_feat, R, t, is_valid, intM, rays2d = res
    B, V = src_feat.shape[:2]
    D = d_center.shape[0]
    H, W, C = ref_feat.shape[1:]
    f32 = jnp.float32
    mdt = _sweep_matching_dtype(src_feat)
    gbar = gbar.astype(f32)                           # (B, D, H, W)
    d_center = d_center.astype(f32)
    Kf, Rf, tf = intM.astype(f32), R.astype(f32), t.astype(f32)
    raysf = rays2d.astype(f32)
    validf = is_valid.astype(f32)

    # ---- grad wrt ref_feat: the sampled (warped) source features,
    # weighted by the upstream cotangent — pure re-GATHER, no scatter.
    env_chunk = os.environ.get("MAGNET_TPU_SWEEP_CHUNK", "")
    if env_chunk:
        chunk = int(env_chunk)
    else:
        per_d = max(1, B * V * H * W * 2 * 2 * C * 4)
        chunk = max(1, int(3.0e9 // per_d))
    chunk = next((c for c in range(min(chunk, D), 0, -1) if D % c == 0),
                 1)
    dg_chunks = d_center.reshape(-1, chunk)

    def per_bv_ref_grad(gbar_b, srcf_v, R_v, t_v, val_v, K_b, rays_b):
        def do_chunk(args):
            dc, g_c = args                     # (chunk,), (chunk, H, W)
            dvol = jnp.broadcast_to(dc[:, None, None], (chunk, H, W))
            x, y, _ = _project(K_b, R_v, t_v, rays_b, dvol, H, W)
            block, w = gather_corner_block(srcf_v.astype(mdt), x, y)
            # corner combine in the matching dtype with f32 accumulation
            # (an explicit f32 block upcast measured ~30 ms/step of pure
            # convert traffic at the training shape)
            sampled = jnp.einsum(
                "dhwyx,dhwyxc->dhwc", w.astype(mdt), block,
                preferred_element_type=f32,
                precision=None if mdt == jnp.bfloat16 else _HI)
            return jnp.einsum("dhw,dhwc->hwc", g_c, sampled,
                              precision=_HI)
        gb = gbar_b.reshape(-1, chunk, H, W)          # (n_chunks, c, H, W)
        parts = jax.lax.map(do_chunk, (dg_chunks, gb))
        return parts.sum(axis=0) * val_v              # (H, W, C)

    def per_b_ref_grad(gbar_b, srcf_b, R_b, t_b, val_b, K_b, rays_b):
        g = jax.vmap(lambda sv, Rv, tv, vv: per_bv_ref_grad(
            gbar_b, sv, Rv, tv, vv, K_b, rays_b))(srcf_b, R_b, t_b,
                                                  val_b)
        return g.sum(axis=0)

    grad_ref = jax.vmap(per_b_ref_grad)(gbar, src_feat, Rf, tf, validf,
                                        Kf, raysf)
    grad_ref = grad_ref.astype(ref_feat.dtype)

    # ---- grad wrt src_feat: windowed dense transpose. For each (sweep
    # plane d, ref-row-pair p), every sample's bilinear footprint lies
    # in a 2*c_rows-row window of the source map at a free per-(b, v)
    # offset (exact min-start when it fits, mean-centered otherwise —
    # the forward kernels' plan policy). The window weights W[s, k]
    # are dense over (window_row, column), so grad accumulation is ONE
    # MXU contraction per step plus a dense dynamic-update-slice —
    # no scatter. On TPU the fused Pallas kernel
    # (kernels/sweepbwd_pallas.py) runs the same contraction with the
    # per-view gradient RESIDENT in VMEM (no per-step
    # slice/update round trips); the XLA scan below is the portable
    # fallback (MAGNET_TPU_SWEEP_BWD=scan forces it).
    mode = os.environ.get("MAGNET_TPU_SWEEP_BWD", "win")
    if mode == "win" and jax.default_backend() == "tpu":
        from magnet_tpu.kernels import sweepbwd_pallas as swb
        if swb.supported(H, W, C):
            grad_src = swb.sweep_grad_src_pallas(
                d_center, ref_feat, src_feat.shape, gbar, R, t,
                is_valid, intM, rays2d).astype(src_feat.dtype)
            zero = lambda a: jnp.zeros_like(a)
            return (zero(d_center).astype(res[0].dtype), grad_ref,
                    grad_src, zero(R), zero(t), zero(is_valid),
                    zero(intM), zero(rays2d))
    c_rows = _sweep_bwd_rows(H)
    win = 2 * c_rows
    n_pairs = H // 2
    # Pairs are processed P at a time per scan step (windows stay
    # per-pair): the per-step scan/dispatch overhead (~90 us measured)
    # dominated the single-pair version, and grouping amortizes it 4x
    # without changing any window placement or numerics.
    P = next(p for p in (4, 3, 2, 1) if n_pairs % p == 0)
    n_groups = n_pairs // P
    reff = ref_feat.astype(f32)
    rays_rows = raysf.reshape(B, 3, H, W)
    kr = jnp.arange(win, dtype=f32)
    kcols = jnp.arange(W, dtype=f32)

    def step(acc, dg):
        di = dg // n_groups
        g = dg - di * n_groups
        d = d_center[di]
        rows = 2 * P * g
        rays_p = jax.lax.dynamic_slice_in_dim(rays_rows, rows, 2 * P,
                                              axis=2)   # (B, 3, 2P, W)

        def proj_bv(K_b, R_v, t_v, rays_b):
            x, y, _ = _project_pts(K_b, R_v, t_v,
                                   rays_b.reshape(3, 2 * P * W), d, H, W)
            return (x.reshape(P, 2, W), y.reshape(P, 2, W))

        x, y = jax.vmap(lambda K_b, R_b, t_b, rays_b: jax.vmap(
            lambda R_v, t_v: proj_bv(K_b, R_v, t_v, rays_b))(R_b, t_b))(
                Kf, Rf, tf, rays_p)                     # (B, V, P, 2, W)

        yc = jnp.clip(y, 0.0, float(H - 1))
        fmin = jnp.floor(yc.min(axis=(3, 4))).astype(jnp.int32)
        fmax = jnp.floor(yc.max(axis=(3, 4))).astype(jnp.int32)
        fit = (fmax + 1 - fmin) <= win - 1
        cen = (jnp.floor(yc.mean(axis=(3, 4))).astype(jnp.int32)
               - c_rows)
        w0 = jnp.clip(jnp.where(fit, fmin, cen), 0, H - win)  # (B,V,P)

        # weights against TRUE (unclamped) coords: samples outside the
        # image or the window get zero weight automatically.
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            y[..., None] - (w0[..., None, None, None].astype(f32) + kr)))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - kcols))
        M = (wy[..., :, None] * wx[..., None, :]).astype(mdt)
        # (B, V, P, 2, W, win, W)

        g_d = jax.lax.dynamic_index_in_dim(gbar, di, axis=1,
                                           keepdims=False)  # (B, H, W)
        g_p = jax.lax.dynamic_slice_in_dim(
            g_d, rows, 2 * P, axis=1).reshape(B, P, 2, W)
        ref_p = jax.lax.dynamic_slice_in_dim(
            reff, rows, 2 * P, axis=1).reshape(B, P, 2, W, C)
        valref = (g_p[:, None, ..., None] * ref_p[:, None]
                  * validf[..., None, None, None, None]).astype(mdt)
        # (B, V, P, 2, W, C)
        grad_win = jnp.einsum("bvpxykw,bvpxyc->bvpkwc", M, valref,
                              preferred_element_type=f32)
        # (B, V, P, win, W, C)

        for b in range(B):
            for v in range(V):
                for p in range(P):
                    start = (b, v, w0[b, v, p], 0, 0)
                    cur = jax.lax.dynamic_slice(acc, start,
                                                (1, 1, win, W, C))
                    acc = jax.lax.dynamic_update_slice(
                        acc, cur + grad_win[b, v, p][None, None], start)
        return acc, None

    acc0 = jnp.zeros((B, V, H, W, C), f32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(D * n_groups))
    grad_src = acc.astype(src_feat.dtype)

    zero = lambda a: jnp.zeros_like(a)
    return (zero(d_center).astype(res[0].dtype), grad_ref, grad_src,
            zero(R), zero(t), zero(is_valid), zero(intM), zero(rays2d))


_sweep_pre_cost.defvjp(_sweep_pre_cost_fwd, _sweep_pre_cost_bwd)

"""Fused plane-sweep BACKWARD kernel: grad wrt source features.

The transpose of the windowed-matmul structure the forward cost-volume
kernels use (costvolume_pallas._kernel_pair_tall), specialized for the
F-Net training sweep (ops/costvolume.py::_sweep_pre_cost_bwd): for each
(sweep plane d, ref-row-pair), every sample's bilinear footprint lies in
a 2*C_ROWS-row window of the source map at a free offset; the gradient
scattered into that window is ONE MXU contraction

    grad_window[k, c] = sum_s  M[s, k] * (gbar * valid * ref)[s, c]

with M the dense (sample, window-pixel) bilinear-weight matrix built
in VMEM per pair — no XLA scatter instruction anywhere (TPU serializes
scatter per index; autodiff's backward measured 32.6 s and crashed the
worker at the training protocol, see ops/costvolume.py).

Layout: the per-view gradient accumulates directly in the kernel's
OUTPUT block (1, 1, H, W, 128) f32, which pallas keeps resident in VMEM
across the (D, tiles) grid steps of one (batch, view) — zeroed at the
view's first step, flushed automatically when the grid moves on. The
projection runs in-kernel from tiny precomputed per-view terms
(K@t and K@R@rays rows), so no (B, V, D, H, W) coordinate tensors ever
exist.

Grid: (B, V, D, n_tiles), row-major (documented Pallas TPU order), so
each (b, v)'s steps are consecutive. tile_h = 8 rows = 4 pairs per
step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_ROWS = 8          # half-window: windows span 2*C_ROWS source rows
TILE_H = 8
_EPS_DIV = 1e-10
_COORD_CLIP = 10.0
# Scoped-VMEM ceiling for the estimator below, calibrated on v5e
# (probe, round 5): the ScanNet dpv shape (est 14.7 MB) compiles and
# runs; the single-2c-chunk variant (est ~18.5 MB) failed scoped-VMEM
# compile at 18.8 MB actual.
_VMEM_LIMIT = 15.35e6


def supported(H: int, W: int, C: int, tile_h: int = TILE_H,
              c_rows: int = C_ROWS) -> bool:
    """Feasibility: aligned contraction chunk, whole tiles, window fits
    the image, and the resident (H, W, 128) f32 accumulator + one live
    pair weight build fit scoped VMEM."""
    if C > 126 or H % tile_h or H < 2 * c_rows or W < 2:
        return False
    if (c_rows * W) % 128:
        return False
    cw = c_rows * W
    est = (H * W * 128 * 4                  # resident output block
           + 2 * W * cw * 4 * 2            # wy + wxp builds (f32)
           + 2 * W * cw * 2                # m (matmul dtype)
           + cw * 128 * 4                  # dot output (f32)
           + 2 * 3 * tile_h * W * 4         # term2 blocks (dbl-buffered)
           + 2 * tile_h * W * (4 + 128 * 2))
    return est <= _VMEM_LIMIT


def _kernel(d_center_ref, valid_ref, term1_ref, term2_ref, gbar_ref,
            ref_ref, rc_ref, out_ref, acc_ref, *, c_rows: int, H: int,
            matmul_dtype):
    # d_center/valid/term1 are scalar-prefetch SMEM refs. The per-view
    # gradient accumulates in a VMEM SCRATCH (single-buffered); the
    # output is tile-blocked and flushed in the trailing di == D grid
    # pass — an out block revisited across every (d, t) step would be
    # double-buffered by the pipeline (measured: 2 x 9.6 MB = 18.8 MB
    # scoped stack, over the 16 MB ceiling).
    b = pl.program_id(0)
    v = pl.program_id(1)
    di = pl.program_id(2)
    t = pl.program_id(3)
    n_d = pl.num_programs(2)            # == D + 1 (flush pass)

    @pl.when((di == 0) & (t == 0))
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    tile_h, W = gbar_ref.shape[2:]
    win = 2 * c_rows
    chunk = c_rows * W
    n_pairs = tile_h // 2
    f32 = jnp.float32

    @pl.when(di == n_d - 1)
    def _flush():
        out_ref[0, 0] = acc_ref[pl.ds(t * tile_h, tile_h)]

    @pl.when(di < n_d - 1)
    def _compute():
        d = d_center_ref[jnp.minimum(di, n_d - 2)]
        val = valid_ref[b, v]
        t2 = term2_ref[0, 0]                            # (3, tile_h, W)
        gbar = gbar_ref[0, 0]                           # (tile_h, W)
        refq = ref_ref[0].astype(f32)                   # (tile_h, W, 128)
        r_rel = rc_ref[0]                               # (chunk,) f32
        c_idx = rc_ref[1]

        # ---- projection for the whole tile (f32 VPU; ops/costvolume.py
        # _project_pts formulas, reference homography.py:99-148)
        P0 = term1_ref[b, v, 0] + t2[0] * d
        P1 = term1_ref[b, v, 1] + t2[1] * d
        P2 = term1_ref[b, v, 2] + t2[2] * d
        denom = P2 + _EPS_DIV
        u = P0 / denom
        vv = P1 / denom
        gx = jnp.clip((u - W / 2.0) / (W / 2.0), -_COORD_CLIP,
                      _COORD_CLIP)
        gy = jnp.clip((vv - H / 2.0) / (H / 2.0), -_COORD_CLIP,
                      _COORD_CLIP)
        x = ((gx + 1.0) * W - 1.0) * 0.5                # (tile_h, W)
        y = ((gy + 1.0) * H - 1.0) * 0.5

        gv = gbar * val                                 # (tile_h, W)

        for p in range(n_pairs):
            sl = slice(2 * p, 2 * p + 2)
            xp = x[sl]                                  # (2, W)
            yp = y[sl]
            # free window offset: exact min-start when the footprint
            # fits, mean-centered otherwise (the forward plan policy)
            yc = jnp.clip(yp, 0.0, float(H - 1))
            fmin = jnp.floor(yc.min()).astype(jnp.int32)
            fmax = jnp.floor(yc.max()).astype(jnp.int32)
            fit = (fmax + 1 - fmin) <= win - 1
            cen = jnp.floor(yc.mean()).astype(jnp.int32) - c_rows
            w0 = jnp.clip(jnp.where(fit, fmin, cen), 0, H - win)

            # dense (sample, window-pixel) weights straight in the
            # matmul dtype; TRUE (unclamped) coords zero
            # out-of-image/-window samples automatically. The window
            # contracts as TWO c_rows-row chunks (the tall forward
            # kernel's two-slab pattern) with per-ROW weight builds,
            # keeping the live f32 build buffers small.
            base = w0.astype(f32)
            valref = (gv[sl][..., None] * refq[sl]).astype(
                matmul_dtype)                           # (2, W, 128)

            for off in (0, c_rows):
                grad_c = None
                for r in range(2):
                    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
                        yp[r][:, None] - (r_rel + base + off)))
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
                        xp[r][:, None] - c_idx))        # (W, chunk)
                    m = (wy * wx).astype(matmul_dtype)
                    dc_ = jax.lax.dot_general(
                        m, valref[r],
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=f32)     # (chunk, 128)
                    grad_c = dc_ if grad_c is None else grad_c + dc_
                acc_ref[pl.ds(w0 + off, c_rows)] += grad_c.reshape(
                    c_rows, W, 128)


def sweep_grad_src_pallas(d_center, ref_feat, src_shape, gbar, R, t,
                          is_valid, intM, rays2d, tile_h: int = TILE_H,
                          c_rows: int = C_ROWS, matmul_dtype=None,
                          interpret: bool = False):
    """grad wrt src_feat of the pre-softmax sweep cost.

    d_center (D,); ref_feat (B, H, W, C); gbar (B, D, H, W) f32 upstream
    cotangent; poses/intrinsics as in cost_volume_sweep. Returns
    (B, V, H, W, C) f32 matching src_shape's leading dims."""
    B, V = src_shape[:2]
    D = d_center.shape[0]
    H, W, C = ref_feat.shape[1:]
    f32 = jnp.float32
    if matmul_dtype is None:
        matmul_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                        else jnp.float32)

    # per-(b, v) projection terms: K@t (3,) and K@R@rays (3, H, W)
    Kf, Rf, tf = intM.astype(f32), R.astype(f32), t.astype(f32)
    raysf = rays2d.astype(f32)

    def terms(K_b, R_v, t_v, rays_b):
        Rrays = jnp.matmul(R_v, rays_b,
                           precision=jax.lax.Precision.HIGHEST)
        t1 = jnp.matmul(K_b, t_v[:, None],
                        precision=jax.lax.Precision.HIGHEST)[:, 0]
        t2 = jnp.matmul(K_b, Rrays,
                        precision=jax.lax.Precision.HIGHEST)
        return t1, t2.reshape(3, H, W)

    t1, t2 = jax.vmap(lambda K_b, R_b, t_b, rays_b: jax.vmap(
        lambda R_v, t_v: terms(K_b, R_v, t_v, rays_b))(R_b, t_b))(
            Kf, Rf, tf, raysf)          # (B, V, 3), (B, V, 3, H, W)

    n_pad = 128 - C
    refp = jnp.concatenate(
        [ref_feat.astype(f32),
         jnp.zeros(ref_feat.shape[:3] + (n_pad,), f32)],
        axis=-1)                                        # (B, H, W, 128)

    chunk = c_rows * W
    j = jnp.arange(chunk)
    rc = jnp.stack([(j // W).astype(f32), (j % W).astype(f32)])

    n_tiles = H // tile_h
    gbar_D = D
    # trailing di == D grid pass flushes the scratch accumulator into
    # the tile-blocked output (see _kernel); gbar/d_center reads are
    # clamped there
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(B, V, D + 1, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 3, tile_h, W),
                         lambda b, v, d, t_, *_: (b, v, 0, t_, 0)),
            pl.BlockSpec((1, 1, tile_h, W),
                         lambda b, v, d, t_, *_:
                         (b, jnp.minimum(d, gbar_D - 1), t_, 0)),
            pl.BlockSpec((1, tile_h, W, 128),
                         lambda b, v, d, t_, *_: (b, t_, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # rc patterns
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tile_h, W, 128),
            lambda b, v, d, t_, *_: (b, v, t_, 0, 0)),
        scratch_shapes=[pltpu.VMEM((H, W, 128), f32)],
    )
    kernel = functools.partial(_kernel, c_rows=c_rows, H=H,
                               matmul_dtype=matmul_dtype)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, V, H, W, 128), f32),
        interpret=interpret,
    )(d_center.astype(f32), is_valid.astype(f32), t1, t2,
      gbar.astype(f32), refp, rc)
    return out[..., :C]

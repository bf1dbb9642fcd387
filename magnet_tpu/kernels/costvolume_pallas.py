"""Pallas TPU kernel: fused consistency-weighted plane-sweep cost volume.

Replaces the XLA corner-block-gather path of ``ops.costvolume.cost_volume_cw``
(reference semantics: models/submodules/homography.py:79-161) for the hot
inference loop. The XLA path spends ~4.8 ms/iteration in one
``lax.gather`` of 384k (2,2,C) corner blocks plus ~2 ms of combine fusions;
gather cost on TPU is per-slice overhead, so the fix is to stop gathering.

Design (row-band + interpolation-matmul):
  grid = (row_tiles, D candidates); the V-view loop is unrolled INSIDE
  the kernel (a (tiles, D, V) grid was measured per-step-overhead bound).
  Per step, the kernel
    1. starts all V band DMAs up front — each a BAND-row slab of that
       view's packed source map (feat ‖ mu ‖ sigma, (BAND, W, C+2)) from
       HBM into its own VMEM slab, starting at a per-(tile,d,v)
       row offset r0 that is scalar-prefetched (computed in XLA as
       floor(min y) over the tile, clamped in-bounds),
    2. builds the dense horizontal bilinear weight tensor
       wx[h, w_out, w_src] = max(0, 1 - |x[h,w_out] - w_src|) with iota —
       exactly grid_sample's zeros-padding row interpolation — and
       contracts it with each band row on the MXU,
    3. combines band rows with the vertical weights
       wy[h, w, r] = max(0, 1 - |y - (r0+r)|) in f32,
    4. computes the matching dot against the reference-feature tile, the
       consistency test |z - mu_warped| < kappa * sigma_warped
       (homography.py:155-159), the view-validity mask, and
    5. accumulates into the (d, tile) output block across the v steps.

  Bilinear sampling therefore costs BAND x W x C MACs per output pixel on
  the MXU instead of 4 gather slices — ~200x the FLOPs of a gather but
  >3x faster wall-clock on v5e, because the MXU is free and slices are not.

Exactness: identical to the XLA path (up to bf16 rounding of the weight
matrix) whenever each (tile, candidate, view)'s sampled rows span at most
BAND-1 source rows. Out-of-band samples degrade gracefully to the
out-of-image value (zero cost) — the same failure semantics as leaving the
frame. With BAND=16 and 8-row tiles this holds for any frame-to-frame
motion under ~8 rows of vertical parallax spread per 8-row tile; the
golden tests cover both in-band exactness and the is_valid / out-of-image
edges. ``ops.costvolume.cost_volume_cw`` keeps the XLA path as the
fallback and reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.ops import costvolume as cv_ops

DEFAULT_BAND = 16
DEFAULT_TILE_H = 8


def _kernel_pair(r0_ref, rp_ref, two_ref, valid_ref, x_ref, y_ref, z_ref,
                 q_ref, rc_ref, p_any, out_ref, band_vmem, acc_ref, sem, *,
                 n_views: int, band: int, c_rows: int, n_feat: int,
                 kappa: float, matmul_dtype):
    """Pair-banded variant: each PAIR of output rows contracts only over a
    c_rows-row slab at its own scalar-prefetched offset rp (plus a second
    slab under ``pl.when`` when the pair's vertical footprint needs it),
    instead of every output row contracting over the whole band. Cuts both
    the VPU weight build and the MXU contraction ~band/c_rows x; exact
    whenever a pair's sampled rows span <= 2*c_rows - 2 source rows
    (degrading to the same zero-cost semantics beyond, like the band
    kernel beyond band - 1)."""
    t = pl.program_id(0)
    d = pl.program_id(1)

    for v in range(n_views):
        pltpu.make_async_copy(
            p_any.at[v, pl.ds(r0_ref[v, d, t], band)],
            band_vmem.at[v], sem.at[v]).start()

    tile_h, W = x_ref.shape[2:]
    nc = band_vmem.shape[-1]
    chunk = c_rows * W
    n_pairs = tile_h // 2
    q = q_ref[...].astype(jnp.float32)                # (tile_h, W, C_feat)
    r_rel = rc_ref[0]                                 # (chunk,) f32
    c_idx = rc_ref[1]

    total = jnp.zeros((tile_h, W), jnp.float32)
    for v in range(n_views):
        x = x_ref[v, 0]                               # (tile_h, W) f32
        y = y_ref[v, 0]
        z = z_ref[v, 0]
        r0 = r0_ref[v, d, t]
        r0f = r0.astype(jnp.float32)
        pltpu.make_async_copy(
            p_any.at[v, pl.ds(r0, band)],
            band_vmem.at[v], sem.at[v]).wait()

        for p in range(n_pairs):
            sl = slice(2 * p, 2 * p + 2)
            xp = x[sl]                                # (2, W)
            yp = y[sl]
            rp = rp_ref[v, d, t, p]
            base = r0f + rp.astype(jnp.float32)
            wxp = jnp.maximum(0.0, 1.0 - jnp.abs(xp[..., None] - c_idx))

            def build(off, yp=yp, base=base, wxp=wxp):
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(yp[..., None] - (r_rel + base + off)))
                return (wy * wxp).astype(matmul_dtype)  # (2, W, chunk)

            def dot(m, off, v=v, rp=rp):
                slab = band_vmem[v, pl.ds(rp + off, c_rows)].reshape(
                    chunk, nc)
                return jax.lax.dot_general(
                    m, slab.astype(matmul_dtype),
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (2, W, nc)

            acc_ref[sl] = dot(build(0), 0)

            @pl.when(two_ref[v, d, t, p] > 0)
            def _second(build=build, dot=dot, sl=sl):
                acc_ref[sl] += dot(build(c_rows), c_rows)

        acc = acc_ref[...]
        feat_cost = jnp.sum(acc[..., :n_feat] * q, axis=-1)
        w_mu = acc[..., n_feat]
        w_sigma = acc[..., n_feat + 1]
        consistent = (jnp.abs(z - w_mu) < w_sigma * kappa)
        total = total + (feat_cost * consistent.astype(jnp.float32)
                         * valid_ref[v])

    out_ref[0] = total


def _kernel(r0_ref, valid_ref, x_ref, y_ref, z_ref, q_ref,
            rc_ref, p_any, out_ref, band_vmem, sem, *,
            n_views: int, band: int, c_rows: int, n_feat: int,
            kappa: float, matmul_dtype):
    t = pl.program_id(0)
    d = pl.program_id(1)

    # All views' band DMAs start up front (independent scratch slabs +
    # semaphores) so view v+1's copy overlaps view v's compute. The view
    # loop lives INSIDE the kernel: a (tiles, D, V) grid spent more in
    # per-step fixed costs (dispatch, q reload, out read-modify-write)
    # than it saved — folding V cut the grid 4x.
    for v in range(n_views):
        pltpu.make_async_copy(
            p_any.at[v, pl.ds(r0_ref[v, d, t], band)],
            band_vmem.at[v], sem.at[v]).start()

    tile_h, W = x_ref.shape[2:]
    nc = band_vmem.shape[-1]
    chunk = c_rows * W
    q = q_ref[...].astype(jnp.float32)                # (tile_h, W, C_feat)
    # rc_ref holds the grid-invariant column patterns (j // W, j % W)
    # precomputed once in XLA.
    r_rel = rc_ref[0]                                 # (chunk,) f32
    c_idx = rc_ref[1]

    total = jnp.zeros((tile_h, W), jnp.float32)
    for v in range(n_views):
        x = x_ref[v, 0]                               # (tile_h, W) f32
        y = y_ref[v, 0]
        z = z_ref[v, 0]
        r0f = r0_ref[v, d, t].astype(jnp.float32)
        pltpu.make_async_copy(
            p_any.at[v, pl.ds(r0_ref[v, d, t], band)],
            band_vmem.at[v], sem.at[v]).wait()

        # Fused bilinear weight matrix, chunked along the contraction
        # axis: column j of a chunk corresponds to source row j // W
        # (+ chunk offset) and source column j % W, so
        #   M[h, w_out, j] = wy(h, w_out, row(j)) * wx(h, w_out, j % W).
        # Built from precomputed index patterns (no lane-dim reshapes,
        # which Mosaic lowers through gathers). Chunk size c is chosen so
        # c*W is a multiple of 128 — every MXU pass is full — while
        # keeping the f32 weight transients a few MB under the VMEM
        # scoped limit (the whole-band tensor at W=160 is 13 MB, OOMs).
        #
        # The chunk loop is SOFTWARE-PIPELINED: chunk i's dot is issued,
        # chunk i+1's weight build (VPU) runs while the MXU retires it,
        # and the accumulate that consumes dot i happens after build
        # i+1. The serial build->dot->accumulate chain was the kernel's
        # bound (measured 2.5 -> 1.8 ms/call pipelined). An earlier
        # exact zero-weight chunk-skip (scalar-prefetched active count +
        # pl.when) measured neutral and is incompatible with the
        # pipeline's cross-chunk registers; pipelining won.
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - c_idx))

        def build(ci, y=y, r0f=r0f, wx=wx):
            r_idx = r_rel + (r0f + ci * c_rows)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y[..., None] - r_idx))
            return (wy * wx).astype(matmul_dtype)     # (tile_h, W, chunk)

        def dot(m, ci, v=v):
            slab = band_vmem[v, ci * c_rows:(ci + 1) * c_rows].reshape(
                chunk, nc)
            return jax.lax.dot_general(
                m, slab.astype(matmul_dtype),
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (tile_h, W, nc)

        acc = None
        pend = dot(build(0), 0)
        for ci in range(1, band // c_rows):
            nxt = dot(build(ci), ci)                  # build overlaps pend
            acc = pend if acc is None else acc + pend
            pend = nxt
        acc = pend if acc is None else acc + pend

        feat_cost = jnp.sum(acc[..., :n_feat] * q, axis=-1)
        w_mu = acc[..., n_feat]
        w_sigma = acc[..., n_feat + 1]
        consistent = (jnp.abs(z - w_mu) < w_sigma * kappa)
        total = total + (feat_cost * consistent.astype(jnp.float32)
                         * valid_ref[v])

    out_ref[0] = total


def _cost_volume_one_batch(dvol, ref_feat, src_feat, src_mu, src_sigma,
                           R, t, valid, K, rays2d, kappa, band, tile_h,
                           interpret, pair):
    """dvol: (D, H, W) f32; ref_feat: (H, W, C); src_*: (V, ...).
    Returns (D, H, W) f32 = sum over views of weighted matching cost."""
    V = src_feat.shape[0]
    D, H, W = dvol.shape
    C = ref_feat.shape[-1]
    f32 = jnp.float32
    mdt = jnp.bfloat16 if src_feat.dtype == jnp.bfloat16 else f32

    # ---- XLA precompute: projection + per-tile band starts (cheap).
    def proj(R_v, t_v):
        return cv_ops._project(K.astype(f32), R_v.astype(f32),
                               t_v.astype(f32), rays2d.astype(f32),
                               dvol, H, W)
    x, y, z = jax.vmap(proj)(R, t)                    # each (V, D, H, W)

    import math
    if pair:
        # Fixed 4-row slabs: pair weight transients stay ~(2, W, 4W) at
        # any width (c_rows tied to gcd(W, 128) made W=304 build 5.9 MB
        # tensors); a chunk length that is not a 128-multiple just pads
        # the final MXU pass.
        c_rows = 4
    else:
        c_rows = 128 // math.gcd(W, 128)
        while band % c_rows:
            c_rows *= 2                               # band is a pow2 mult
    band = max(band, 2 * c_rows)                      # room for 2 pair slabs

    n_tiles = H // tile_h
    y_tiles = y.reshape(V, D, n_tiles, tile_h * W)
    r0 = jnp.floor(y_tiles.min(axis=-1)).astype(jnp.int32)
    r0 = jnp.clip(r0, 0, H - band)                    # (V, D, n_tiles)

    if pair:
        # Per-PAIR slab offsets relative to r0: rp = clip(floor(min y of
        # the 2-row pair) - r0, 0, band - 2*c_rows), and whether the
        # pair's footprint [floor(min y), floor(max y) + 1] needs a
        # second c_rows slab.
        y_pairs = y.reshape(V, D, n_tiles, tile_h // 2, 2 * W)
        fmin = jnp.floor(y_pairs.min(axis=-1)).astype(jnp.int32)
        fmax = jnp.floor(y_pairs.max(axis=-1)).astype(jnp.int32)
        rp = jnp.clip(fmin - r0[..., None], 0, band - 2 * c_rows)
        two = ((fmax + 1) - (r0[..., None] + rp)
               > c_rows - 1).astype(jnp.int32)        # (V, D, T, pairs)

    # Packed channels padded to a full 128-lane tile: Mosaic requires the
    # DMA slice's lane dim tile-aligned, and N=128 exactly fills the MXU.
    n_pad = 128 - (C + 2)
    packed = jnp.concatenate(
        [src_feat.astype(mdt),
         src_mu.astype(f32)[..., None].astype(mdt),
         src_sigma.astype(f32)[..., None].astype(mdt),
         jnp.zeros(src_mu.shape + (n_pad,), mdt)],
        axis=-1)                                      # (V, H, W, 128)
    queries = ref_feat.astype(mdt)                    # (H, W, C)

    # Grid-invariant weight-column patterns (see _kernel): row index and
    # column index of each contraction column within a chunk.
    j = jnp.arange(c_rows * W)
    rc = jnp.stack([(j // W).astype(f32), (j % W).astype(f32)])

    grid = (n_tiles, D)
    coord_spec = pl.BlockSpec(
        (V, 1, tile_h, W), lambda t_, d_, *_: (0, d_, t_, 0))
    in_specs = [
        coord_spec, coord_spec, coord_spec,
        pl.BlockSpec((tile_h, W, C), lambda t_, d_, *_: (t_, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),        # rc patterns (tiny)
        pl.BlockSpec(memory_space=pltpu.ANY),         # stays in HBM (19MB)
    ]
    out_spec = pl.BlockSpec(
        (1, tile_h, W), lambda t_, d_, *_: (d_, t_, 0))
    scratch = [
        pltpu.VMEM((V, band, W, 128), mdt),
        pltpu.SemaphoreType.DMA((V,)),
    ]
    if pair:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4, grid=grid, in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=[scratch[0],
                            pltpu.VMEM((tile_h, W, 128), f32),
                            scratch[1]])
        kernel = functools.partial(
            _kernel_pair, n_views=V, band=band, c_rows=c_rows, n_feat=C,
            kappa=float(kappa), matmul_dtype=mdt)
        args = (r0, rp, two, valid.astype(f32), x, y, z, queries, rc,
                packed)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=grid, in_specs=in_specs,
            out_specs=out_spec, scratch_shapes=scratch)
        kernel = functools.partial(
            _kernel, n_views=V, band=band, c_rows=c_rows, n_feat=C,
            kappa=float(kappa), matmul_dtype=mdt)
        args = (r0, valid.astype(f32), x, y, z, queries, rc, packed)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((D, H, W), f32),
        interpret=interpret,
    )(*args)


def supported(d_volume, H, W, tile_h: int = DEFAULT_TILE_H,
              band: int = DEFAULT_BAND) -> bool:
    """Shape gate for the kernel (fallback to XLA otherwise)."""
    return H % tile_h == 0 and H >= band and W >= 2


def use_pair_kernel() -> bool:
    """Default: the pair-banded kernel (~2x less VPU+MXU work than the
    full-band kernel). MAGNET_TPU_CV_PAIR=0 forces the band kernel."""
    import os
    return os.environ.get("MAGNET_TPU_CV_PAIR", "1") == "1"


def cost_volume_cw_pallas(d_volume: jnp.ndarray, ref_feat: jnp.ndarray,
                          src_feat: jnp.ndarray, src_mu: jnp.ndarray,
                          src_sigma: jnp.ndarray, R: jnp.ndarray,
                          t: jnp.ndarray, is_valid: jnp.ndarray,
                          intM: jnp.ndarray, rays2d: jnp.ndarray,
                          kappa: float, band: int = DEFAULT_BAND,
                          tile_h: int = DEFAULT_TILE_H,
                          interpret: bool = False,
                          pair: bool = None) -> jnp.ndarray:
    """Drop-in for ``ops.costvolume.cost_volume_cw`` (same contract:
    NHWC d_volume (B, H, W, D) in, (B, H, W, D) out, mean over V)."""
    B, H, W, D = d_volume.shape
    V = src_feat.shape[1]
    if pair is None:
        pair = use_pair_kernel()
    dvol = jnp.moveaxis(d_volume, -1, 1).astype(jnp.float32)

    outs = []
    for b in range(B):
        outs.append(_cost_volume_one_batch(
            dvol[b], ref_feat[b], src_feat[b], src_mu[b], src_sigma[b],
            R[b], t[b], is_valid[b], intM[b], rays2d[b], kappa,
            band, tile_h, interpret, pair))
    cost = jnp.stack(outs) / float(V)                 # (B, D, H, W)
    return jnp.moveaxis(cost, 1, -1)

"""Pallas TPU kernel: fused MBConv chains for the EfficientNet-B5 tail.

The trunk's late stages run many small stride-1 InvertedResidual blocks
(expand 1x1 -> BN -> swish -> depthwise KxK -> BN -> swish -> SE ->
project 1x1 -> BN -> residual; efficientnet.py / gen-efficientnet's
InvertedResidual) on tiny maps (60x80 and below for 480x640 inputs).
Op-by-op XLA spends more on launches, relayouts around the grouped dw
conv, SE broadcast/reduce formatting and swish fusions than on math. This
kernel runs every stride-1 block of a stage as ONE chain per frame:

  * grid (frame, block); the feature map lives in a persistent VMEM
    scratch across the whole chain — one HBM read at block 0 and one
    write at the last block,
  * per-block weights are stacked (n_blocks, ...) arrays consumed as
    blocked operands indexed by the block id, so Pallas double-buffers
    the next block's weights while the current one computes,
  * eval BatchNorm is folded: bn1/bn2 scales into the expand/dw weights,
    bn3 into the projection; shifts applied as epilogues,
  * the depthwise conv is a KxK shift-multiply-accumulate on the VPU
    over the VMEM-resident expanded map (no relayouts, no grouped-conv
    data formatting),
  * SE runs in f32 exactly as the module does (whole map is resident, so
    the global mean is free), and the sigmoid gate is folded into the
    projection weights' rows — the (H, W, M) gate broadcast XLA
    materializes never exists.

Each stage's stride-2 / channel-changing block 0 stays on XLA (shapes
are not uniform); the chain covers blocks 1..n-1, whose residual
condition (in_ch == out_ch, stride 1) always holds. Training and
non-TPU backends keep the module path (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from magnet_tpu.kernels.psmstage_pallas import _shift_w


def use_mbchain(stage_idx: int | None = None) -> bool:
    """Whether stage ``stage_idx``'s tail should run the fused chain.

    MAGNET_TPU_PALLAS_MB: "0" disables, "1" enables every supported
    stage, a comma list ("3,5") enables only those stage indices.

    Default: OFF (documented negative result). The controlled v5e A/B at
    the bench shape — convstream held fixed — measured the best single
    chain (stage 5) NEUTRAL (33.2 fps off vs 33.4 on, inside the ±0.5
    run variance) and every multi-stage combination NEGATIVE (all-on
    32.5). Profile: the chains run at ~10-20% MFU because the depthwise
    tap accumulate + SE are VPU-scale work in the kernel exactly as they
    are under XLA, while XLA runs all four stage tails in ~2.6 ms vs the
    chains' ~4.4 — the launch/format overhead the chain removes is
    smaller than its own per-step cost at these map sizes.
    """
    import os
    env = os.environ.get("MAGNET_TPU_PALLAS_MB", "")
    if env == "0":
        return False
    if env == "1":
        return True
    if env:
        return stage_idx is None or str(stage_idx) in env.split(",")
    return False


def supported(H: int, W: int, C: int, M: int, n_blocks: int,
              itemsize: int = 2) -> bool:
    if n_blocks < 1 or C % 8 != 0:
        return False
    # Peak live set: in + out + x_map scratch (3 x HWC), the expanded
    # map (bf16) coexisting with the f32 dw accumulator (HWM x 6), and
    # the double-buffered per-block weight blocks (pw + pwl dominate).
    # Excludes stage 2 at 480x640 (60x80 x M=384 maps) and stage 6
    # (512x3072 weight blocks) — those need row-banding / single-buffered
    # weight DMA respectively.
    need = (3 * H * W * C * itemsize + H * W * M * (itemsize + 4)
            + 4 * C * M * itemsize)
    return need <= 13 * 1024 * 1024


def _shift_h(slab, o: int):
    """Shift along the leading (row) axis with zero fill."""
    if o == 0:
        return slab
    if o > 0:
        return jnp.concatenate(
            [slab[o:], jnp.zeros_like(slab[:o])], axis=0)
    return jnp.concatenate(
        [jnp.zeros_like(slab[o:]), slab[:o]], axis=0)


def _swish(x):
    # Mosaic cannot lower bf16 logistic (f32 constant broadcast into a
    # bf16 vector fails verification) — run the sigmoid in f32.
    if x.dtype == jnp.float32:
        return x * jax.nn.sigmoid(x)
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def _kernel(x_ref, wpw_ref, s1_ref, wdw_ref, s2_ref, wse1_ref, bse1_ref,
            wse2_ref, bse2_ref, wpwl_ref, s3_ref, out_ref, x_map, *,
            K: int, n_blocks: int):
    b = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(b == 0)
    def _load():
        x_map[...] = x_ref[0]

    x = x_map[...]                                     # (H, W, C) bf16
    dt = x.dtype
    M = wdw_ref.shape[-1]

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    # expand 1x1 (bn1 scale folded into columns) + shift + swish
    mid = dot(x, wpw_ref[0])
    mid = _swish((mid + s1_ref[0, 0][None, None, :]).astype(dt))

    # depthwise KxK (bn2 scale folded into taps) + shift + swish.
    # Sublane (W) shifts are real VPU permute passes; leading-dim (H)
    # concats are tile-register moves. Hoisting dx outward does K
    # sublane shifts instead of K*K.
    r = K // 2
    acc = jnp.zeros(mid.shape, f32)
    for dx in range(K):
        sw = _shift_w(mid, dx - r)
        for dy in range(K):
            tap = _shift_h(sw, dy - r)
            acc = acc + (tap * wdw_ref[0, dy * K + dx][None, None, :]
                         ).astype(f32)
    mid2 = _swish((acc + s2_ref[0, 0][None, None, :]).astype(dt))

    # SE in f32 (module computes the pooled path in f32)
    pool = jnp.mean(mid2.astype(f32), axis=(0, 1), keepdims=False)
    pr = _swish(jax.lax.dot_general(
        pool[None], wse1_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bse1_ref[0, 0][None])
    gate = jax.nn.sigmoid(jax.lax.dot_general(
        pr, wse2_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32) + bse2_ref[0, 0][None])[0]   # (M,) f32

    # project 1x1 with the SE gate folded into the weight rows
    # (conv1x1(x * g) == x @ (g[:, None] * W)); bn3 scale pre-folded.
    wmod = (gate[:, None] * wpwl_ref[0].astype(f32)).astype(dt)
    y = dot(mid2, wmod) + s3_ref[0, 0][None, None, :]
    x_map[...] = y.astype(dt) + x                      # residual

    @pl.when(b == n_blocks - 1)
    def _store():
        out_ref[0] = x_map[...]


def mbchain_fused(x: jnp.ndarray, wpw, s1, wdw, s2, wse1, bse1, wse2,
                  bse2, wpwl, s3, kernel_size: int,
                  interpret: bool = False) -> jnp.ndarray:
    """x: (N, H, W, C). Stacked per-block weights (nb leading dim):
    wpw (nb, C, M) expand with bn1 scale folded; s1 (nb, M) f32 shift;
    wdw (nb, K*K, M) depthwise taps with bn2 scale folded; s2 (nb, M);
    wse1 (nb, M, R), bse1 (nb, R), wse2 (nb, R, M), bse2 (nb, M) f32;
    wpwl (nb, M, C) projection with bn3 scale folded; s3 (nb, C).
    Returns (N, H, W, C) after chaining all nb residual blocks."""
    N, H, W, C = x.shape
    nb, _, M = wpw.shape
    dt = x.dtype
    f32 = jnp.float32

    kernel = functools.partial(_kernel, K=kernel_size, n_blocks=nb)

    def bspec(shape):
        nd = len(shape)
        return pl.BlockSpec((1,) + tuple(shape[1:]),
                            lambda f, b: (b,) + (0,) * (nd - 1))

    # per-block shift/bias vectors as (nb, 1, X): Pallas TPU blocks must
    # have their second-minor dim divisible by 8 or equal to the array's
    vec = lambda a, dtype: a.astype(dtype)[:, None, :]
    return pl.pallas_call(
        kernel,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda f, b: (f, 0, 0, 0)),
            bspec(wpw.shape), bspec((nb, 1, M)), bspec(wdw.shape),
            bspec((nb, 1, M)), bspec(wse1.shape),
            bspec((nb, 1, bse1.shape[-1])), bspec(wse2.shape),
            bspec((nb, 1, M)), bspec(wpwl.shape), bspec((nb, 1, C)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda f, b: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), dt),
        scratch_shapes=[pltpu.VMEM((H, W, C), dt)],
        interpret=interpret,
    )(x, wpw.astype(dt), vec(s1, f32), wdw.astype(dt), vec(s2, f32),
      wse1.astype(f32), vec(bse1, f32), wse2.astype(f32),
      vec(bse2, f32), wpwl.astype(dt), vec(s3, f32))

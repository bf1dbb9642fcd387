"""Pallas TPU kernel: fused G-Net residual Gaussian update.

G-Net (reference models/MAGNET.py:47-70; magnet_tpu/nn/gnet.py) is four
tiny convolutions plus the sigma-normalized Gaussian update, applied to a
(120, 160) map at batch 1, three times per frame. Run op-by-op through
XLA, each conv costs more in launch/layout overhead than in FLOPs
(~1.4 ms/frame for ~4.5 GFLOP, <1% MFU). This kernel runs the whole
update — conv0_cv (3x3 over the D=5 cost volume, lane-padded weights),
+feat_contrib, ReLU, conv1, ReLU, conv2, ReLU, conv3, and the
mu/sigma residual update — in one pass over row tiles, everything
VMEM-resident.

Weight packing (pack_gnet, pure jnp at trace time):
  conv0_cv (3, 3, D, 128) -> (9, 128, 128): tap j = dy*3+dx as a K=128
  matrix whose first D rows are real (the cost volume rides in a
  128-lane-padded tensor; the zero rows multiply the padding).
  conv1/conv2/conv3 kernels -> (128, 128) (conv3's 2 output channels sit
  in lanes 0..1, rest zero).

The XLA module path (nn/gnet.py) stays the reference and the training
path; this kernel is inference-only (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_CHOICES = (24, 22, 20, 16, 15, 12, 10, 8)
# Scoped-VMEM budget for _vmem_est below, calibrated on v5e (round 5):
# KITTI (88 x 304) at tile 22 fails compile at 17.0 MB actual
# (est 19.0 MB); tile 8 (est 11.4 MB) compiles and runs. ScanNet
# (120 x 160) keeps tile 24 (est 12.0 MB).
_VMEM_BUDGET = 13.5e6


def _vmem_est(H: int, W: int, tile: int, itemsize: int) -> float:
    """Resident padded cv + double-buffered feat blocks + the f32
    acc/h temporaries + the halo row slice."""
    return ((H + 2) * (W + 2) * 128 * itemsize
            + 2 * tile * W * 128 * itemsize
            + 2 * tile * W * 128 * 4
            + tile * (W + 2) * 128 * itemsize)


def _tile_h(H: int, W: int = 160, itemsize: int = 2):
    """Largest dividing row tile whose VMEM estimate fits the budget —
    wide shapes (KITTI) take smaller tiles instead of failing the
    scoped-VMEM compile (a latent round-4 defect: the whole-map
    resident cv left <2 MB of headroom at 304-wide maps)."""
    for t in _TILE_CHOICES:
        if H % t == 0 and _vmem_est(H, W, t, itemsize) <= _VMEM_BUDGET:
            return t
    return None


def pack_gnet(params, d: int, dtype):
    """params: the GNet flax param tree. Returns packed operands."""
    k0 = params["conv0_cv"]["conv"]["kernel"]          # (3, 3, D, 128)
    hid = k0.shape[-1]
    w0 = jnp.zeros((9, 128, hid), k0.dtype)
    w0 = w0.at[:, :d, :].set(
        k0.reshape(9, d, hid))                          # taps dy*3+dx
    w1 = params["conv1"]["conv"]["kernel"][0, 0]        # (128, 128)
    w2 = params["conv2"]["conv"]["kernel"][0, 0]
    k3 = params["conv3"]["conv"]["kernel"][0, 0]        # (128, out)
    w3 = jnp.zeros((hid, 128), k3.dtype).at[:, :k3.shape[-1]].set(k3)
    b1 = params["conv1"]["conv"]["bias"]
    b2 = params["conv2"]["conv"]["bias"]
    b3 = jnp.zeros((128,), k3.dtype).at[:k3.shape[-1]].set(
        params["conv3"]["conv"]["bias"])
    ws = jnp.stack([w1, w2, w3])                        # (3, 128, 128)
    bs = jnp.stack([b1, b2, b3]).astype(jnp.float32)    # (3, 128)
    return (w0.astype(dtype), ws.astype(dtype), bs)


def _kernel(cvp_ref, feat_ref, prev_ref, w0_ref, ws_ref, bs_ref, out_ref,
            *, W: int, tile_h: int):
    f32 = jnp.float32
    t = pl.program_id(0)
    dt = feat_ref.dtype

    acc = jnp.zeros((tile_h, W, w0_ref.shape[-1]), f32)
    for dy in range(3):
        rows = cvp_ref[0, pl.ds(t * tile_h + dy, tile_h)]  # (tile, W+2, 128)
        for dx in range(3):
            slab = rows[:, dx:dx + W, :]
            acc = acc + jax.lax.dot_general(
                slab, w0_ref[dy * 3 + dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=f32)
    h = jnp.maximum(acc + feat_ref[0].astype(f32), 0.0)

    for li in range(2):                                  # conv1, conv2
        h = jax.lax.dot_general(
            h.astype(dt), ws_ref[li],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)
        h = jnp.maximum(h + bs_ref[pl.ds(li, 1)][:, None, :], 0.0)
    y = jax.lax.dot_general(
        h.astype(dt), ws_ref[2],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)
    y = y + bs_ref[pl.ds(2, 1)][:, None, :]

    mu1 = y[:, :, 0:1]
    sig1 = y[:, :, 1:2]
    prev = prev_ref[0].astype(f32)                       # (tile, W, 2)
    mu0 = prev[:, :, 0:1]
    sig0 = prev[:, :, 1:2]
    # expm1 has no Mosaic lowering; exp-1 in f32 is fine here because the
    # next op adds 1 back (sigma_new = (elu+1+eps)*sigma_0)
    elu = jnp.where(sig1 > 0, sig1, jnp.exp(sig1) - 1.0)
    new_mu = mu0 + mu1 * sig0
    new_sig = (elu + 1.0 + 1e-10) * sig0
    out_ref[0] = jnp.concatenate([new_mu, new_sig],
                                 axis=-1).astype(out_ref.dtype)


def gnet_update_pallas(cv: jnp.ndarray, feat_contrib: jnp.ndarray,
                       prev: jnp.ndarray, params,
                       interpret: bool = False) -> jnp.ndarray:
    """cv: (B, H, W, D) cost volume; feat_contrib: (B, H, W, 128) from
    GNet.precompute_feature; prev: (B, H, W, 2) current (mu, sigma).
    params: GNet param tree. Returns (B, H, W, 2), dtype of prev."""
    B, H, W, D = cv.shape
    dt = feat_contrib.dtype
    tile = _tile_h(H, W, jnp.dtype(dt).itemsize)
    w0, ws, bs = pack_gnet(params, D, dt)

    # Cost volume lane-padded to 128 and spatially padded for the 3x3:
    # rows get one extra tile at the bottom so the halo BlockSpec-style
    # read cvp[t*tile+dy : +tile] is always in bounds.
    cvp = jnp.zeros((B, H + 2, W + 2, 128), dt)
    cvp = cvp.at[:, 1:H + 1, 1:W + 1, :D].set(cv.astype(dt))

    kernel = functools.partial(_kernel, W=W, tile_h=tile)
    outs = []
    for b in range(B):
        outs.append(pl.pallas_call(
            kernel,
            grid=(H // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),   # padded cv, whole
                pl.BlockSpec((1, tile, W, feat_contrib.shape[-1]),
                             lambda t: (0, t, 0, 0)),
                pl.BlockSpec((1, tile, W, 2), lambda t: (0, t, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, W, 2), lambda t: (0, t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, H, W, 2), prev.dtype),
            interpret=interpret,
        )(cvp[b:b + 1], feat_contrib[b:b + 1], prev[b:b + 1],
          w0, ws, bs))
    return jnp.concatenate(outs, axis=0)


def supported(cv_shape, hidden: int, itemsize: int = 2) -> bool:
    B, H, W, D = cv_shape
    return (_tile_h(H, W, itemsize) is not None and D <= 16
            and hidden == 128)
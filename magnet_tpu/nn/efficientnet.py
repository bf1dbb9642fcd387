"""EfficientNet-B5 encoder (the ``tf_efficientnet_b5_ap`` variant), Flax NHWC.

The reference's D-Net encoder is ``tf_efficientnet_b5_ap`` from torch.hub
(rwightman/gen-efficientnet-pytorch; D_dense_depth.py:10-11), consumed as a
feature pyramid: the decoder taps ``features[4, 5, 6, 8, 11]`` of the list
[input, stem_conv, stem_bn, stem_act, block_stage_0..6, conv_head, ...]
(D_dense_depth.py:17-25,167), i.e. the outputs of block stages 0/1/2/4 and
the (pre-BN) head conv:

    tap        stage       stride   channels (B5)
    f4         blocks[0]   /2       24
    f5         blocks[1]   /4       40
    f6         blocks[2]   /8       64
    f8         blocks[4]   /16      176
    f11        conv_head   /32      2048

"tf_" semantics reproduced here: TF-SAME (asymmetric) conv padding,
BatchNorm eps 1e-3, swish activations, squeeze-excitation ratio 0.25 of each
block's *input* channels. Stochastic depth (drop-connect 0.2, linearly
scaled per block) applies at training time only.

Module/parameter names mirror the torch state-dict layout
(conv_stem/bn1/blocks.i.j.{conv_pw,bn1,conv_dw,bn2,se,conv_pwl,bn3}/
conv_head/bn2) so checkpoint conversion is mechanical.
"""

from __future__ import annotations

import math
from typing import List

import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.layers import BatchNorm, Conv, drop_path, swish

BN_EPS_TF = 1e-3


def round_channels(ch: float, multiplier: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (make_divisible)."""
    ch *= multiplier
    new_ch = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * ch:
        new_ch += divisor
    return int(new_ch)


def round_repeats(repeats: int, multiplier: float) -> int:
    return int(math.ceil(multiplier * repeats))


# Base (B0) stage definitions: (block_type, kernel, stride, expand, out_ch,
# repeats). B5: width x1.6, depth x2.2.
_B0_STAGES = (
    ("ds", 3, 1, 1, 16, 1),
    ("ir", 3, 2, 6, 24, 2),
    ("ir", 5, 2, 6, 40, 2),
    ("ir", 3, 2, 6, 80, 3),
    ("ir", 5, 1, 6, 112, 3),
    ("ir", 5, 2, 6, 192, 4),
    ("ir", 3, 1, 6, 320, 1),
)


def b5_stage_config():
    """Per-block config list-of-stages for B5 (width 1.6, depth 2.2)."""
    width, depth = 1.6, 2.2
    stages = []
    in_ch = round_channels(32, width)          # stem: 48
    for (btype, k, s, e, c, n) in _B0_STAGES:
        out_ch = round_channels(c, width)
        blocks = []
        for i in range(round_repeats(n, depth)):
            blocks.append(dict(
                btype=btype, kernel=k, stride=s if i == 0 else 1,
                expand=e, in_ch=in_ch, out_ch=out_ch))
            in_ch = out_ch
        stages.append(blocks)
    return stages


def _se_wide_pool() -> bool:
    """MAGNET_TPU_SE_WIDE=1: compute the SE global pool as a two-stage
    reduce over a (N, H, W*C) view instead of a (1,2)-axis mean. The
    trunk's SE pools measure ~35% of HBM peak (docs/KERNELS.md roofline)
    because sub-128 channel counts leave most VPU lanes idle during the
    cross-HW reduction; flattening (W, C) into the minor dimension keeps
    all 128 lanes busy for the large first-stage reduce, and the second
    stage reduces only W*C elements. Bitwise-different f32 summation
    order, same value to reduction tolerance. Default pending A/B."""
    import os
    return os.environ.get("MAGNET_TPU_SE_WIDE", "0") == "1"


class SqueezeExcite(nn.Module):
    """SE gate: pool -> reduce 1x1 -> swish -> expand 1x1 -> sigmoid."""
    reduced_ch: int

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        if _se_wide_pool() and not self.is_initializing():
            N, H, W, C = x.shape
            s = jnp.sum(x.astype(jnp.float32).reshape(N, H, W * C),
                        axis=1)
            se = (s.reshape(N, W, C).sum(axis=1)
                  / float(H * W))[:, None, None, :]
        else:
            se = jnp.mean(x.astype(jnp.float32), axis=(1, 2),
                          keepdims=True)
        se = Conv(self.reduced_ch, 1, use_bias=True, name="conv_reduce")(se)
        se = swish(se)
        se = Conv(ch, 1, use_bias=True, name="conv_expand")(se)
        return x * nn.sigmoid(se).astype(x.dtype)


class DepthwiseSeparable(nn.Module):
    """Stage-0 block: dw conv -> BN -> swish -> SE -> pw conv -> BN."""
    cfg: dict
    dp_rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        shortcut = x
        y = Conv(c["in_ch"], c["kernel"], c["stride"], padding="SAME",
                 groups=c["in_ch"], use_bias=False,
                 name="conv_dw")(x, dw_pallas=not train)
        y = BatchNorm(eps=BN_EPS_TF, name="bn1")(y, train)
        y = swish(y)
        y = SqueezeExcite(max(1, int(c["in_ch"] * 0.25)), name="se")(y)
        y = Conv(c["out_ch"], 1, use_bias=False, name="conv_pw")(y)
        y = BatchNorm(eps=BN_EPS_TF, name="bn2")(y, train)
        if c["in_ch"] == c["out_ch"] and c["stride"] == 1:
            if train and self.dp_rate > 0:
                y = drop_path(y, self.dp_rate, deterministic=not train,
                              rng=self.make_rng("droppath"))
            y = y + shortcut
        return y


class InvertedResidual(nn.Module):
    """MBConv: pw expand -> dw -> SE -> pw linear, residual when possible."""
    cfg: dict
    dp_rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        shortcut = x
        mid = c["in_ch"] * c["expand"]
        y = Conv(mid, 1, use_bias=False, name="conv_pw")(x)
        y = BatchNorm(eps=BN_EPS_TF, name="bn1")(y, train)
        y = swish(y)
        y = Conv(mid, c["kernel"], c["stride"], padding="SAME", groups=mid,
                 use_bias=False, name="conv_dw")(y, dw_pallas=not train)
        y = BatchNorm(eps=BN_EPS_TF, name="bn2")(y, train)
        y = swish(y)
        y = SqueezeExcite(max(1, int(c["in_ch"] * 0.25)), name="se")(y)
        y = Conv(c["out_ch"], 1, use_bias=False, name="conv_pwl")(y)
        y = BatchNorm(eps=BN_EPS_TF, name="bn3")(y, train)
        if c["in_ch"] == c["out_ch"] and c["stride"] == 1:
            if train and self.dp_rate > 0:
                y = drop_path(y, self.dp_rate, deterministic=not train,
                              rng=self.make_rng("droppath"))
            y = y + shortcut
        return y


def _stage_chain_shapes(y_shape, stage):
    """(H, W, C, M) of a stage's uniform stride-1 tail, after block 0."""
    s = stage[0]["stride"]
    H = -(-y_shape[1] // s)
    W = -(-y_shape[2] // s)
    C = stage[1]["in_ch"]
    return H, W, C, C * stage[1]["expand"]


class EfficientNetB5Features(nn.Module):
    """Returns the 5 decoder taps (f4, f5, f6, f8, f11); see module doc.

    remat=True checkpoints each block (jax.checkpoint via nn.remat):
    activations inside a block are recomputed during backward instead of
    stored, trading ~1 extra block forward for O(taps) instead of
    O(all 39 blocks) of live activation memory — enables larger training
    batches per chip.
    """
    drop_connect_rate: float = 0.2
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jnp.ndarray]:
        stages = b5_stage_config()
        n_blocks = sum(len(s) for s in stages)

        y = Conv(48, 3, 2, padding="SAME", use_bias=False,
                 name="conv_stem")(x)
        y = BatchNorm(eps=BN_EPS_TF, name="bn1")(y, train)
        y = swish(y)

        from magnet_tpu.kernels import mbchain_pallas as mb

        taps = {}
        block_idx = 0
        for si, stage in enumerate(stages):
            # A stage's stride-1 tail (blocks 1..n-1: uniform channels,
            # kernel, expansion, always-residual) can run as one fused
            # Pallas chain per frame at eval time.
            chain = []
            if (not train and not self.is_initializing()
                    and mb.use_mbchain(si) and len(stage) > 1
                    and stage[1]["btype"] == "ir"):
                H0, W0, C, M = _stage_chain_shapes(y.shape, stage)
                if mb.supported(H0, W0, C, M, len(stage) - 1,
                                y.dtype.itemsize):
                    chain = stage[1:]
            for bi, cfg in enumerate(stage[:len(stage) - len(chain)]):
                dp = self.drop_connect_rate * block_idx / n_blocks
                cls = DepthwiseSeparable if cfg["btype"] == "ds" \
                    else InvertedResidual
                if self.remat:
                    cls = nn.remat(cls, static_argnums=(2,))
                y = cls(cfg, dp, name=f"blocks_{si}_{bi}")(y, train)
                block_idx += 1
            if chain:
                y = self._fused_chain(y, si, chain)
                block_idx += len(chain)
            taps[si] = y

        head = Conv(2048, 1, use_bias=False, name="conv_head")(y)
        # NOTE: the decoder consumes the head conv *before* bn2/act
        # (features[11] in D_dense_depth.py:167 is the raw conv output).
        # bn2 params still exist in checkpoints; keep them for conversion
        # completeness.
        _ = BatchNorm(eps=BN_EPS_TF, name="bn2")(head, train)
        return [taps[0], taps[1], taps[2], taps[4], head]

    def _fused_chain(self, y, si: int, chain) -> jnp.ndarray:
        """Run stage si's blocks 1..n-1 as one Pallas MBConv chain, with
        eval-BN folded into the stacked per-block weights."""
        import jax
        from magnet_tpu.kernels.mbchain_pallas import mbchain_fused
        from magnet_tpu.kernels.psmstage_pallas import fold_bn

        K = chain[0]["kernel"]
        M = chain[0]["in_ch"] * chain[0]["expand"]
        packs = {k: [] for k in ("wpw", "s1", "wdw", "s2", "wse1", "bse1",
                                 "wse2", "bse2", "wpwl", "s3")}
        for j in range(len(chain)):
            name = f"blocks_{si}_{j + 1}"
            p = self.variables["params"][name]
            st = self.variables["batch_stats"][name]

            def bn(tag):
                return fold_bn(p[tag]["bn"]["scale"], p[tag]["bn"]["bias"],
                               st[tag]["bn"]["mean"], st[tag]["bn"]["var"],
                               BN_EPS_TF)
            sc1, t1 = bn("bn1")
            sc2, t2 = bn("bn2")
            sc3, t3 = bn("bn3")
            packs["wpw"].append(
                p["conv_pw"]["conv"]["kernel"][0, 0] * sc1[None, :])
            packs["s1"].append(t1)
            packs["wdw"].append(
                p["conv_dw"]["conv"]["kernel"].reshape(K * K, M)
                * sc2[None, :])
            packs["s2"].append(t2)
            packs["wse1"].append(p["se"]["conv_reduce"]["conv"]["kernel"][0, 0])
            packs["bse1"].append(p["se"]["conv_reduce"]["conv"]["bias"])
            packs["wse2"].append(p["se"]["conv_expand"]["conv"]["kernel"][0, 0])
            packs["bse2"].append(p["se"]["conv_expand"]["conv"]["bias"])
            packs["wpwl"].append(
                p["conv_pwl"]["conv"]["kernel"][0, 0] * sc3[None, :])
            packs["s3"].append(t3)
        stacked = {k: jnp.stack(v) for k, v in packs.items()}
        return mbchain_fused(
            y, stacked["wpw"], stacked["s1"], stacked["wdw"], stacked["s2"],
            stacked["wse1"], stacked["bse1"], stacked["wse2"],
            stacked["bse2"], stacked["wpwl"], stacked["s3"], K,
            interpret=jax.default_backend() != "tpu")

"""DenseDepth: EfficientNet-B5 U-Net for single-view Gaussian depth (D-Net).

Flax re-design of the reference D-Net body (models/submodules/
D_dense_depth.py): the B5 encoder's feature pyramid feeds a U-Net decoder
whose blocks bilinearly upsample (align_corners=True), concat the skip, and
apply two conv+norm+LeakyReLU stages — BatchNorm or GroupNorm+weight-
standardized convs (D_dense_depth.py:29-59). A 3-layer head predicts
(mu, sigma-param); with learned upsampling a second head predicts the
RAFT-style convex-combination mask (D_dense_depth.py:148-160).

downsample_ratio selects decoder depth: 8 -> up1..2 (i_dim 512),
4 -> up1..3 (i_dim 256), 2 -> up1..4 (i_dim 128) (D_dense_depth.py:120-145).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.efficientnet import EfficientNetB5Features
from magnet_tpu.nn.layers import (BatchNorm, Conv, GroupNorm, WSConv,
                                  leaky_relu, relu)
from magnet_tpu.ops.resample import resize_bilinear_align_corners
from magnet_tpu.ops.upsample import upsample_bilinear, upsample_via_mask


class UpSampleBN(nn.Module):
    """[upsample -> merge skip] -> (conv3x3-BN-LeakyReLU) x2.

    TPU restructuring: the reference concatenates the upsampled features
    (2048/1024/512 ch) with the thin encoder skip (176/64/40 ch) and
    convolves the 2224/1088/552-channel result (D_dense_depth.py:39-42).
    A conv over a channel concat equals the sum of two convs, so conv_a is
    split into conv_a_up (clean 128-multiple input width, carries the
    bias) + conv_a_skip — removing both the concat relayout and the
    odd-width matmul. Checkpoint conversion splits the torch kernel along
    input channels.
    """
    features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        from magnet_tpu.kernels import upstage_pallas as ups
        if (not train and not self.is_initializing()
                and self.features == 256
                and ups.use_pallas_upstage()
                and ups.supported(x.shape, skip.shape,
                                  x.dtype.itemsize)):
            import jax as _jax
            from magnet_tpu.kernels.psmstage_pallas import fold_bn
            p = self.variables["params"]
            st = self.variables["batch_stats"]
            sa, ta = fold_bn(
                p["bn_a"]["bn"]["scale"], p["bn_a"]["bn"]["bias"],
                st["bn_a"]["bn"]["mean"], st["bn_a"]["bn"]["var"])
            sb, tb = fold_bn(
                p["bn_b"]["bn"]["scale"], p["bn_b"]["bn"]["bias"],
                st["bn_b"]["bn"]["mean"], st["bn_b"]["bn"]["var"])
            return ups.upstage_fused(
                x, skip,
                p["conv_a_up"]["conv"]["kernel"],
                p["conv_a_up"]["conv"]["bias"],
                p["conv_a_skip"]["conv"]["kernel"], sa, ta,
                p["conv_b"]["conv"]["kernel"],
                p["conv_b"]["conv"]["bias"], sb, tb,
                interpret=_jax.default_backend() != "tpu")
        if (not train and not self.is_initializing()
                and self.features == 512):
            from magnet_tpu.kernels import convstream_pallas as cs
            if cs.use_convstream() and cs.up2_supported(
                    x.shape, skip.shape, x.dtype.itemsize):
                import jax as _jax
                from magnet_tpu.kernels.psmstage_pallas import fold_bn
                p = self.variables["params"]
                st = self.variables["batch_stats"]
                sa, ta = fold_bn(
                    p["bn_a"]["bn"]["scale"], p["bn_a"]["bn"]["bias"],
                    st["bn_a"]["bn"]["mean"], st["bn_a"]["bn"]["var"])
                sb, tb = fold_bn(
                    p["bn_b"]["bn"]["scale"], p["bn_b"]["bn"]["bias"],
                    st["bn_b"]["bn"]["mean"], st["bn_b"]["bn"]["var"])
                up = resize_bilinear_align_corners(
                    x, skip.shape[-3], skip.shape[-2])
                return cs.up2_fused(
                    up, skip,
                    p["conv_a_up"]["conv"]["kernel"],
                    p["conv_a_up"]["conv"]["bias"],
                    p["conv_a_skip"]["conv"]["kernel"], sa, ta,
                    p["conv_b"]["conv"]["kernel"],
                    p["conv_b"]["conv"]["bias"], sb, tb,
                    interpret=_jax.default_backend() != "tpu")
        up = resize_bilinear_align_corners(x, skip.shape[-3], skip.shape[-2])
        y = Conv(self.features, 3, padding=1, name="conv_a_up")(up) + \
            Conv(self.features, 3, padding=1, use_bias=False,
                 name="conv_a_skip")(skip.astype(up.dtype))
        y = BatchNorm(name="bn_a")(y, train)
        y = leaky_relu(y)
        y = Conv(self.features, 3, padding=1, name="conv_b")(y)
        y = BatchNorm(name="bn_b")(y, train)
        return leaky_relu(y)


class UpSampleGN(nn.Module):
    """Same, with weight-standardized convs + GroupNorm(8)."""
    features: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        up = resize_bilinear_align_corners(x, skip.shape[-3], skip.shape[-2])
        y = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
        y = WSConv(self.features, 3, padding=1, name="conv_a")(y)
        y = GroupNorm(8, name="gn_a")(y)
        y = leaky_relu(y)
        y = WSConv(self.features, 3, padding=1, name="conv_b")(y)
        y = GroupNorm(8, name="gn_b")(y)
        return leaky_relu(y)


class _Head(nn.Module):
    """conv3x3 -> ReLU -> conv1x1 -> ReLU -> conv1x1 (depth & mask heads)."""
    out_ch: int
    hidden: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        from magnet_tpu.kernels import headchain_pallas as hc
        if (not train and not self.is_initializing()
                and hc.use_pallas_heads() and hc.supported(x.shape)):
            import jax as _jax
            p = self.variables["params"]
            convs = [(p[n]["conv"]["kernel"], p[n]["conv"]["bias"], r)
                     for n, r in (("conv0", True), ("conv1", True),
                                  ("conv2", False))]
            return hc.head_chain_pallas(
                x, convs, interpret=_jax.default_backend() != "tpu")
        y = relu(Conv(self.hidden, 3, padding=1, name="conv0")(x))
        y = relu(Conv(self.hidden, 1, name="conv1")(y))
        return Conv(self.out_ch, 1, name="conv2")(y)


class DenseDepth(nn.Module):
    """Full D-Net body. Returns:
      as_dnet=True:  (B, k*h, k*w, num_classes) learned-upsampled output
      as_dnet=False: ((B, h, w, num_classes), (B, h, w, i_dim) feature)
    where (h, w) = input/downsample_ratio (D_dense_depth.py:186-195).
    """
    num_classes: int = 2
    downsample_ratio: int = 4
    learned_upsampling: bool = True
    use_bn: bool = True
    as_dnet: bool = True
    remat: bool = False    # checkpoint encoder blocks + decoder stages

    @nn.compact
    def __call__(self, x, train: bool = False):
        f4, f5, f6, f8, f11 = EfficientNetB5Features(
            name="encoder", remat=self.remat)(x, train)

        Up = UpSampleBN if self.use_bn else UpSampleGN
        if self.remat:
            Up = nn.remat(Up, static_argnums=(3,))
        n_ups = {8: 2, 4: 3, 2: 4}[self.downsample_ratio]
        skips = [f8, f6, f5, f4][:n_ups]
        feats = 2048

        y = Conv(feats, 1, name="conv2")(f11)
        for i, skip in enumerate(skips):
            y = Up(feats >> (i + 1), name=f"up{i + 1}")(y, skip, train)

        depth = _Head(self.num_classes, name="depth_head")(y, train)

        if not self.as_dnet:
            return depth, y

        if self.learned_upsampling:
            k = self.downsample_ratio
            mask = _Head(9 * k * k, name="mask_head")(y, train)
            return upsample_via_mask(depth, mask, k)
        return upsample_bilinear(depth, None, self.downsample_ratio)

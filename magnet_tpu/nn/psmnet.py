"""PSM-Net 2-D feature extractor (F-Net body), Flax NHWC.

Re-design of the reference matching-feature network (models/submodules/
F_psmnet.py): stride-2 stem of three conv-BN-ReLU layers, four residual
stages (32x3, 64x16 s2, 128x3, 128x3 dil2), a 4-branch spatial pyramid
pooling (avg pool 64/32/16/8 -> 1x1 conv-BN-ReLU -> bilinear
align_corners=True resize back), concat to 320 channels, and a final
3x3 conv-BN-ReLU + 1x1 projection to ``feature_dim``. Output stride 4.

Conv weights use Kaiming-normal fan-out init (F_psmnet.py:71-85).

TPU inference path: runs of stride-1 residual blocks in layer2 (15 of 16)
and layer3/layer4 execute as single fused Pallas kernels that keep the
feature map resident in VMEM (kernels/psmstage_pallas.py) — golden-tested
against this module's own XLA path, which remains the reference and the
training path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from magnet_tpu.nn.layers import BatchNorm, relu
from magnet_tpu.ops.resample import avg_pool, resize_bilinear_align_corners


def _use_psm_fused() -> bool:
    """MAGNET_TPU_PALLAS_PSM=0/1 forces; default on for TPU. A forced '1'
    on non-TPU backends runs in interpret mode (integration tests)."""
    env = os.environ.get("MAGNET_TPU_PALLAS_PSM", "")
    if env in ("0", "1"):
        return env == "1"
    return jax.default_backend() == "tpu"

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out",
                                            "truncated_normal")


def _kaiming_normal(key, shape, dtype=jnp.float32):
    import jax
    fan_out = shape[0] * shape[1] * shape[3]    # k*k*out_ch
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class ConvBN(nn.Module):
    """conv (no bias) + BN; dilation>1 implies padding=dilation
    (F_psmnet.py:10-15)."""
    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        from magnet_tpu.nn.layers import _S2DConv, _s2d_applicable
        pad = self.dilation if self.dilation > 1 else self.pad
        if self.dilation == 1 and _s2d_applicable(
                x.shape, self.kernel, self.kernel,
                (self.stride, self.stride)):
            y = _S2DConv(features=self.features,
                         kernel_size=(self.kernel, self.kernel),
                         padding=((pad, pad), (pad, pad)), use_bias=False,
                         dtype=None, kernel_init=_kaiming_normal,
                         name="conv")(x)
        else:
            y = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        kernel_dilation=(self.dilation, self.dilation),
                        use_bias=False, kernel_init=_kaiming_normal,
                        name="conv")(x)
        return BatchNorm(name="bn")(y, train)


class BasicBlock(nn.Module):
    """Residual block; NO activation after the sum (F_psmnet.py:28-34)."""
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = relu(ConvBN(self.planes, 3, self.stride, 1, self.dilation,
                        name="convbn1")(x, train))
        y = ConvBN(self.planes, 3, 1, 1, self.dilation,
                   name="convbn2")(y, train)
        if self.has_downsample:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,
                                                      self.stride),
                        use_bias=False, kernel_init=_kaiming_normal,
                        name="down_conv")(x)
            x = BatchNorm(name="down_bn")(x, train)
        return y + x


class PSMNet(nn.Module):
    feature_dim: int = 64
    remat: bool = False    # checkpoint residual blocks (larger batches)

    @staticmethod
    def _chain_ok(y, n_blocks: int, dilation: int) -> bool:
        from magnet_tpu.kernels import psmstage_pallas as psp
        return psp.supported(y.shape, n_blocks, dilation, y.dtype.itemsize)

    def _fused_chain(self, y, li: int, b_range, dilation: int):
        """Run BasicBlocks [b_range] of layer `li` as one fused Pallas
        stage, reading this module's already-declared parameters (same
        tree as the XLA path — checkpoint-identical)."""
        from magnet_tpu.kernels import psmstage_pallas as psp
        v = self.variables
        mode = psp.mode_for(y.shape[-1])
        pack = {"quad": psp.pack_conv_quad, "paired": psp.pack_conv_paired,
                "natural": psp.pack_conv_natural}[mode]
        ws, ss, ts = [], [], []
        for bi in b_range:
            p = v["params"][f"layer{li}_{bi}"]
            st = v["batch_stats"][f"layer{li}_{bi}"]
            for cb in ("convbn1", "convbn2"):
                ws.append(pack(p[cb]["conv"]["kernel"].astype(y.dtype)))
                s_, t_ = psp.fold_bn(
                    p[cb]["bn"]["bn"]["scale"], p[cb]["bn"]["bn"]["bias"],
                    st[cb]["bn"]["bn"]["mean"], st[cb]["bn"]["bn"]["var"])
                ss.append(s_)
                ts.append(t_)
        import jax as _jax
        return psp.fused_residual_stage(
            y, jnp.stack(ws), jnp.stack(ss), jnp.stack(ts), dilation,
            mode, interpret=_jax.default_backend() != "tpu")

    def _stream_block(self, y, li: int, bi: int, dilation: int):
        """Run one stride-1 BasicBlock as a row-streaming Pallas kernel
        (kernels/resstream_pallas.py) — the KITTI-shape path where the
        whole-map chains exceed VMEM. Reads the module's declared
        parameters (checkpoint-identical tree)."""
        from magnet_tpu.kernels import psmstage_pallas as psp
        from magnet_tpu.kernels import resstream_pallas as rst
        v = self.variables
        p = v["params"][f"layer{li}_{bi}"]
        st = v["batch_stats"][f"layer{li}_{bi}"]

        def bn(cb):
            return psp.fold_bn(
                p[cb]["bn"]["bn"]["scale"], p[cb]["bn"]["bn"]["bias"],
                st[cb]["bn"]["bn"]["mean"], st[cb]["bn"]["bn"]["var"])

        s1, t1 = bn("convbn1")
        s2, t2 = bn("convbn2")
        import jax as _jax
        return rst.resblock_stream(
            y, p["convbn1"]["conv"]["kernel"], s1, t1,
            p["convbn2"]["conv"]["kernel"], s2, t2, dilation=dilation,
            interpret=_jax.default_backend() != "tpu")

    def _fused_downsample(self, y, li: int):
        """Run the layer2_0 stride-2 downsample block (quad in, pair
        out) as one fused Pallas kernel (kernels/psmtrans_pallas.py)."""
        from magnet_tpu.kernels import psmstage_pallas as psp
        from magnet_tpu.kernels import psmtrans_pallas as ptr
        v = self.variables
        p = v["params"][f"layer{li}_0"]
        st = v["batch_stats"][f"layer{li}_0"]

        def bn(cb):
            return psp.fold_bn(
                p[cb]["bn"]["bn"]["scale"], p[cb]["bn"]["bn"]["bias"],
                st[cb]["bn"]["bn"]["mean"], st[cb]["bn"]["bn"]["var"])

        s1, t1 = bn("convbn1")
        s2, t2 = bn("convbn2")
        sp_, tp_ = psp.fold_bn(
            p["down_bn"]["bn"]["scale"], p["down_bn"]["bn"]["bias"],
            st["down_bn"]["bn"]["mean"], st["down_bn"]["bn"]["var"])
        import jax as _jax
        return ptr.downsample_block(
            y, p["convbn1"]["conv"]["kernel"], s1, t1,
            p["convbn2"]["conv"]["kernel"], s2, t2,
            p["down_conv"]["kernel"], sp_, tp_,
            interpret=_jax.default_backend() != "tpu")

    def _fused_expand(self, y, li: int):
        """Run the layer3_0 stride-1 channel-expansion block (pair in,
        natural out) as one fused Pallas kernel
        (kernels/psmtrans2_pallas.py)."""
        from magnet_tpu.kernels import psmstage_pallas as psp
        from magnet_tpu.kernels import psmtrans2_pallas as pt2
        v = self.variables
        p = v["params"][f"layer{li}_0"]
        st = v["batch_stats"][f"layer{li}_0"]

        def bn(cb):
            return psp.fold_bn(
                p[cb]["bn"]["bn"]["scale"], p[cb]["bn"]["bn"]["bias"],
                st[cb]["bn"]["bn"]["mean"], st[cb]["bn"]["bn"]["var"])

        s1, t1 = bn("convbn1")
        s2, t2 = bn("convbn2")
        sp_, tp_ = psp.fold_bn(
            p["down_bn"]["bn"]["scale"], p["down_bn"]["bn"]["bias"],
            st["down_bn"]["bn"]["mean"], st["down_bn"]["bn"]["var"])
        import jax as _jax
        return pt2.expand_block(
            y, p["convbn1"]["conv"]["kernel"], s1, t1,
            p["convbn2"]["conv"]["kernel"], s2, t2,
            p["down_conv"]["kernel"], sp_, tp_,
            interpret=_jax.default_backend() != "tpu")

    def _fused_stem(self, y):
        """Run firstconv1 + firstconv2 (conv-BN-ReLU each,
        F_psmnet.py:41-43) as one fused quad-packed Pallas chain
        (residual=False), reading the already-declared parameters."""
        from magnet_tpu.kernels import psmstage_pallas as psp
        v = self.variables
        ws, ss, ts = [], [], []
        for name in ("firstconv1", "firstconv2"):
            p = v["params"][name]
            st = v["batch_stats"][name]
            ws.append(psp.pack_conv_quad(
                p["conv"]["kernel"].astype(y.dtype)))
            s_, t_ = psp.fold_bn(
                p["bn"]["bn"]["scale"], p["bn"]["bn"]["bias"],
                st["bn"]["bn"]["mean"], st["bn"]["bn"]["var"])
            ss.append(s_)
            ts.append(t_)
        import jax as _jax
        return psp.fused_residual_stage(
            y, jnp.stack(ws), jnp.stack(ss), jnp.stack(ts), 1, "quad",
            residual=False, interpret=_jax.default_backend() != "tpu")

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = nn.remat(BasicBlock, static_argnums=(2,)) if self.remat \
            else BasicBlock
        use_fused = (not train and not self.is_initializing()
                     and _use_psm_fused())
        # Stem (stride 2)
        y = relu(ConvBN(32, 3, 2, 1, name="firstconv0")(x, train))
        if use_fused and self._chain_ok(y, 1, 1):
            y = self._fused_stem(y)
        else:
            y = relu(ConvBN(32, 3, 1, 1, name="firstconv1")(y, train))
            y = relu(ConvBN(32, 3, 1, 1, name="firstconv2")(y, train))

        # Residual stages: (planes, blocks, stride, dilation)
        stage_cfg = [(32, 3, 1, 1), (64, 16, 2, 1),
                     (128, 3, 1, 1), (128, 3, 1, 2)]
        in_planes = 32
        outputs = []
        for li, (planes, blocks, stride, dil) in enumerate(stage_cfg, 1):
            bi = 0
            while bi < blocks:
                s = stride if bi == 0 else 1
                down = bi == 0 and (s != 1 or in_planes != planes)
                if use_fused and down and s == 2 and planes == 64:
                    from magnet_tpu.kernels import psmtrans_pallas as ptr
                    if ptr.supported(y.shape, y.dtype.itemsize):
                        y = self._fused_downsample(y, li)
                        bi += 1
                        in_planes = planes
                        continue
                if use_fused and down and s == 1 and planes == 128 \
                        and in_planes == 64:
                    from magnet_tpu.kernels import psmtrans2_pallas as pt2
                    if pt2.use_p2n() and pt2.supported(
                            y.shape, y.dtype.itemsize):
                        y = self._fused_expand(y, li)
                        bi += 1
                        in_planes = planes
                        continue
                if use_fused and not down and s == 1 and blocks - bi > 1 \
                        and self._chain_ok(y, blocks - bi, dil):
                    y = self._fused_chain(y, li, range(bi, blocks), dil)
                    bi = blocks
                    in_planes = planes
                    continue
                from magnet_tpu.kernels import resstream_pallas as rst
                if use_fused and not down and s == 1 \
                        and rst.use_resstream() and rst.supported(
                            y.shape, dil, y.dtype.itemsize):
                    # maps too large for the whole-map VMEM chains
                    # (KITTI shapes) can stream row bands — opt-in,
                    # measured slower than XLA there (see kernel doc)
                    y = self._stream_block(y, li, bi, dil)
                    bi += 1
                else:
                    y = Block(planes, s, dil, down,
                              name=f"layer{li}_{bi}")(y, train)
                    bi += 1
                in_planes = planes
            outputs.append(y)

        out_raw = outputs[1]          # after layer2 (stride 4, 64ch)
        out_skip = outputs[3]         # after layer4 (128ch)
        H, W = out_skip.shape[-3], out_skip.shape[-2]

        # SPP: 4 average-pool branches resized back (align_corners=True).
        # Window clamped to the feature size so tiny inputs stay valid;
        # at the reference resolutions (>=88x304 post-stride-4) this is
        # the identity and matches AvgPool2d exactly.
        branches = []
        for bi, win in enumerate([64, 32, 16, 8], 1):
            win = min(win, H, W)
            b = avg_pool(out_skip, win, win)
            b = relu(ConvBN(32, 1, 1, 0, name=f"branch{bi}")(b, train))
            branches.append(resize_bilinear_align_corners(b, H, W))

        # Concat order: raw, skip, branch4, branch3, branch2, branch1
        # (F_psmnet.py:122).
        from magnet_tpu.kernels import spptail_pallas as spt
        if use_fused and spt.supported(out_skip.shape, self.feature_dim,
                                       out_skip.dtype.itemsize):
            from magnet_tpu.kernels import psmstage_pallas as psp
            import jax as _jax
            p = self.variables["params"]
            st = self.variables["batch_stats"]
            br = jnp.concatenate(
                [branches[3], branches[2], branches[1], branches[0]],
                axis=-1)
            s0, t0 = psp.fold_bn(
                p["lastconv0"]["bn"]["bn"]["scale"],
                p["lastconv0"]["bn"]["bn"]["bias"],
                st["lastconv0"]["bn"]["bn"]["mean"],
                st["lastconv0"]["bn"]["bn"]["var"])
            return spt.spp_tail_fused(
                out_raw, out_skip, br,
                p["lastconv0"]["conv"]["kernel"], s0, t0,
                p["lastconv1"]["kernel"][0, 0],
                interpret=_jax.default_backend() != "tpu")
        cat = jnp.concatenate(
            [out_raw, out_skip, branches[3], branches[2], branches[1],
             branches[0]], axis=-1)
        y = relu(ConvBN(128, 3, 1, 1, name="lastconv0")(cat, train))
        y = nn.Conv(self.feature_dim, (1, 1), use_bias=False,
                    kernel_init=_kaiming_normal, name="lastconv1")(y)
        return y

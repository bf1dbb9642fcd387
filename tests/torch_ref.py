"""Torch oracle models for parity testing.

Clean-room torch implementations of the documented reference architectures
(SURVEY.md section 2.1; gen-efficientnet B5 / DenseDepth / PSM-Net / G-Net
specs), with state-dict key layouts matching the reference checkpoints.
Used only as test oracles: random weights are exported through the
magnet_tpu torch->flax converter and outputs are compared.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

BN_EPS_TF = 1e-3


def swish(x):
    return x * torch.sigmoid(x)


class Conv2dSame(nn.Conv2d):
    """TF-SAME conv: asymmetric pad (right/bottom heavy)."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + (kh - 1) * self.dilation[0]
                 + 1 - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + (kw - 1) * self.dilation[1]
                 + 1 - iw, 0)
        x = F.pad(x, [pw // 2, pw - pw // 2, ph // 2, ph - ph // 2])
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class SqueezeExcite(nn.Module):
    def __init__(self, ch, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(ch, reduced, 1, bias=True)
        self.conv_expand = nn.Conv2d(reduced, ch, 1, bias=True)

    def forward(self, x):
        se = x.mean((2, 3), keepdim=True)
        se = swish(self.conv_reduce(se))
        return x * torch.sigmoid(self.conv_expand(se))


class DSBlock(nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride):
        super().__init__()
        self.conv_dw = Conv2dSame(in_ch, in_ch, kernel, stride,
                                  groups=in_ch, bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch, eps=BN_EPS_TF)
        self.se = SqueezeExcite(in_ch, max(1, int(in_ch * 0.25)))
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch, eps=BN_EPS_TF)
        self.residual = in_ch == out_ch and stride == 1

    def forward(self, x):
        y = swish(self.bn1(self.conv_dw(x)))
        y = self.se(y)
        y = self.bn2(self.conv_pw(y))
        return y + x if self.residual else y


class IRBlock(nn.Module):
    def __init__(self, in_ch, out_ch, kernel, stride, expand):
        super().__init__()
        mid = in_ch * expand
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=BN_EPS_TF)
        self.conv_dw = Conv2dSame(mid, mid, kernel, stride, groups=mid,
                                  bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=BN_EPS_TF)
        self.se = SqueezeExcite(mid, max(1, int(in_ch * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch, eps=BN_EPS_TF)
        self.residual = in_ch == out_ch and stride == 1

    def forward(self, x):
        y = swish(self.bn1(self.conv_pw(x)))
        y = swish(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.residual else y


class EffNetB5(nn.Module):
    """gen-efficientnet-style B5 trunk exposing stage taps."""

    def __init__(self):
        super().__init__()
        from magnet_tpu.nn.efficientnet import b5_stage_config
        self.conv_stem = Conv2dSame(3, 48, 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(48, eps=BN_EPS_TF)
        stages = []
        for stage in b5_stage_config():
            blocks = []
            for c in stage:
                if c["btype"] == "ds":
                    blocks.append(DSBlock(c["in_ch"], c["out_ch"],
                                          c["kernel"], c["stride"]))
                else:
                    blocks.append(IRBlock(c["in_ch"], c["out_ch"],
                                          c["kernel"], c["stride"],
                                          c["expand"]))
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)
        self.conv_head = nn.Conv2d(512, 2048, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(2048, eps=BN_EPS_TF)

    def forward(self, x):
        y = swish(self.bn1(self.conv_stem(x)))
        taps = []
        for stage in self.blocks:
            y = stage(y)
            taps.append(y)
        head = self.conv_head(y)
        return [taps[0], taps[1], taps[2], taps[4], head]


class Encoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.original_model = EffNetB5()

    def forward(self, x):
        return self.original_model(x)


class _Swish(nn.Module):
    def forward(self, x):
        return swish(x)


class EffNetB5Hub(nn.Module):
    """EffNetB5 re-shaped like gen-efficientnet's GenEfficientNet: same
    state-dict keys, but child-module ORDER and names match what
    `torch.hub.load('rwightman/gen-efficientnet-pytorch', ...)` returns, so
    the reference Encoder's `_modules.items()` feature collection
    (D_dense_depth.py:17-25) taps the same tensors (features[4,5,6,8,11] =
    blocks 0/1/2/4 outputs + pre-bn2 conv_head). Used to satisfy the
    reference's torch.hub dependency offline in oracle tests."""

    def __init__(self):
        super().__init__()
        base = EffNetB5()
        self.conv_stem = base.conv_stem
        self.bn1 = base.bn1
        self.act1 = _Swish()
        self.blocks = base.blocks
        self.conv_head = base.conv_head
        self.bn2 = base.bn2
        self.act2 = _Swish()
        self.global_pool = nn.Identity()
        self.classifier = nn.Identity()

    def forward(self, x):  # classification trunk; unused by the tests
        y = self.act1(self.bn1(self.conv_stem(x)))
        y = self.blocks(y)
        y = self.act2(self.bn2(self.conv_head(y)))
        return self.classifier(self.global_pool(y))


class UpSampleBNT(nn.Module):
    def __init__(self, skip_input, out_f):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(skip_input, out_f, 3, padding=1),
            nn.BatchNorm2d(out_f), nn.LeakyReLU(),
            nn.Conv2d(out_f, out_f, 3, padding=1),
            nn.BatchNorm2d(out_f), nn.LeakyReLU())

    def forward(self, x, skip):
        up = F.interpolate(x, size=skip.shape[-2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, skip], 1))


def head(in_ch, out_ch, hidden=128):
    return nn.Sequential(nn.Conv2d(in_ch, hidden, 3, padding=1),
                         nn.ReLU(True), nn.Conv2d(hidden, hidden, 1),
                         nn.ReLU(True), nn.Conv2d(hidden, out_ch, 1))


class DecoderT(nn.Module):
    """downsample_ratio=4 BN decoder (the configuration of every released
    checkpoint)."""

    def __init__(self, num_classes=2, k=4, dnet=True):
        super().__init__()
        self.k, self.dnet = k, dnet
        self.conv2 = nn.Conv2d(2048, 2048, 1)
        self.up1 = UpSampleBNT(2048 + 176, 1024)
        self.up2 = UpSampleBNT(1024 + 64, 512)
        self.up3 = UpSampleBNT(512 + 40, 256)
        self.depth_head = head(256, num_classes)
        self.mask_head = head(256, 9 * k * k)

    def forward(self, feats):
        f4, f5, f6, f8, f11 = feats
        y = self.conv2(f11)
        y = self.up1(y, f8)
        y = self.up2(y, f6)
        y = self.up3(y, f5)
        depth = self.depth_head(y)
        if not self.dnet:
            return depth, y
        mask = self.mask_head(y)
        return convex_upsample(depth, mask, self.k)


def convex_upsample(depth, up_mask, k):
    N, o_dim, H, W = depth.shape
    m = up_mask.view(N, 1, 9, k, k, H, W).softmax(dim=2)
    d = F.unfold(depth, [3, 3], padding=1).view(N, o_dim, 9, 1, 1, H, W)
    out = (m * d).sum(2).permute(0, 1, 4, 2, 5, 3)
    return out.reshape(N, o_dim, k * H, k * W)


class DNET_T(nn.Module):
    """Standalone D-Net oracle (output_type G)."""

    def __init__(self, dnet=True):
        super().__init__()
        self.d_net = nn.Module()
        self.d_net.encoder = Encoder()
        self.d_net.decoder = DecoderT(dnet=dnet)
        self.dnet = dnet

    def forward(self, x):
        out = self.d_net.decoder(self.d_net.encoder(x))
        if self.dnet:
            mu, var = torch.split(out, 1, dim=1)
            var = F.elu(var) + 1.0 + 1e-10
            return torch.cat([mu, var], 1)
        depth, feat = out
        mu, var = torch.split(depth, 1, dim=1)
        var = F.elu(var) + 1.0 + 1e-10
        return torch.cat([mu, var.sqrt()], 1), feat


# ---------------- PSM-Net oracle ----------------

def convbn(inp, outp, k, s, pad, dil):
    return nn.Sequential(
        nn.Conv2d(inp, outp, k, s, dil if dil > 1 else pad, dil,
                  bias=False),
        nn.BatchNorm2d(outp))


class BasicBlockT(nn.Module):
    def __init__(self, inplanes, planes, stride, downsample, pad, dil):
        super().__init__()
        self.conv1 = nn.Sequential(convbn(inplanes, planes, 3, stride, pad,
                                          dil), nn.ReLU(True))
        self.conv2 = convbn(planes, planes, 3, 1, pad, dil)
        self.downsample = downsample

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        if self.downsample is not None:
            x = self.downsample(x)
        return out + x


class PSMNetT(nn.Module):
    def __init__(self, feature_dim=64):
        super().__init__()
        self.inplanes = 32
        self.firstconv = nn.Sequential(
            convbn(3, 32, 3, 2, 1, 1), nn.ReLU(True),
            convbn(32, 32, 3, 1, 1, 1), nn.ReLU(True),
            convbn(32, 32, 3, 1, 1, 1), nn.ReLU(True))
        self.layer1 = self._make_layer(32, 3, 1, 1, 1)
        self.layer2 = self._make_layer(64, 16, 2, 1, 1)
        self.layer3 = self._make_layer(128, 3, 1, 1, 1)
        self.layer4 = self._make_layer(128, 3, 1, 1, 2)
        for i, win in zip(range(1, 5), (64, 32, 16, 8)):
            setattr(self, f"branch{i}", nn.Sequential(
                nn.AvgPool2d((win, win), stride=(win, win)),
                convbn(128, 32, 1, 1, 0, 1), nn.ReLU(True)))
        self.lastconv = nn.Sequential(
            convbn(320, 128, 3, 1, 1, 1), nn.ReLU(True),
            nn.Conv2d(128, feature_dim, 1, bias=False))

    def _make_layer(self, planes, blocks, stride, pad, dil):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes))
        layers = [BasicBlockT(self.inplanes, planes, stride, downsample,
                              pad, dil)]
        self.inplanes = planes
        layers += [BasicBlockT(planes, planes, 1, None, pad, dil)
                   for _ in range(blocks - 1)]
        return nn.Sequential(*layers)

    def forward(self, x):
        y = self.firstconv(x)
        l1 = self.layer1(y)
        raw = self.layer2(l1)
        l3 = self.layer3(raw)
        skip = self.layer4(l3)
        size = skip.shape[-2:]
        bs = [F.interpolate(getattr(self, f"branch{i}")(skip), size=size,
                            mode="bilinear", align_corners=True)
              for i in range(1, 5)]
        cat = torch.cat([raw, skip, bs[3], bs[2], bs[1], bs[0]], 1)
        return self.lastconv(cat)


class FNET_T(nn.Module):
    def __init__(self, feature_dim=64):
        super().__init__()
        self.f_net = PSMNetT(feature_dim)

    def forward(self, x):
        return self.f_net(x)


class GNET_T(nn.Module):
    def __init__(self, ch_in, ch_out=2):
        super().__init__()
        self.gnet = nn.Sequential(
            nn.Conv2d(ch_in, 128, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(128, 128, 1), nn.ReLU(True),
            nn.Conv2d(128, 128, 1), nn.ReLU(True),
            nn.Conv2d(128, ch_out, 1))

    def forward(self, cv, ref_gmm):
        mu0, s0 = torch.split(ref_gmm, 1, dim=1)
        out = self.gnet(cv)
        mu1, s1 = torch.split(out, 1, dim=1)
        mu = mu0 + mu1 * s0
        s = (F.elu(s1) + 1.0 + 1e-10) * s0
        return torch.cat([mu, s], 1)


def randomize_(model: nn.Module, seed: int = 0):
    """Random weights + random (positive) BN running stats, eval mode."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.Conv2d):
            # fan-in-scaled so activations stay O(1) through the deep net;
            # otherwise fp32 accumulation noise swamps the comparison.
            fan_in = m.weight.shape[1] * m.weight.shape[2] * \
                m.weight.shape[3]
            nn.init.normal_(m.weight, 0, (1.0 / fan_in) ** 0.5,
                            generator=g)
            if m.bias is not None:
                nn.init.normal_(m.bias, 0, 0.02, generator=g)
        elif isinstance(m, (nn.BatchNorm2d, nn.GroupNorm)):
            nn.init.uniform_(m.weight, 0.5, 1.5, generator=g)
            nn.init.normal_(m.bias, 0, 0.1, generator=g)
            if isinstance(m, nn.BatchNorm2d):
                nn.init.normal_(m.running_mean, 0, 0.5, generator=g)
                nn.init.uniform_(m.running_var, 0.5, 2.0, generator=g)
    model.eval()
    return model

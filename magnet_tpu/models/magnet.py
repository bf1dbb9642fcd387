"""MaGNet: the full multi-view fusion pipeline (reference models/MAGNET.py).

One jitted forward:
  1. D-Net + F-Net on ref + source frames in a single batched pass
     (frozen; MAGNET.py:133-144 wraps them in no_grad — here
     `stop_gradient`).
  2. N_iter refinement steps (static count, unrolled — 3 iterations;
     MAGNET.py:151): sample per-pixel depth candidates mu + sigma * k from
     the current Gaussian (k_list from the inverse normal CDF covering
     +-beta in equal-probability bins, MAGNET.py:120-128), build the
     consistency-weighted cost volume, and apply the G-Net residual update.
     The cost volume and the previous prediction are detached before G-Net
     exactly as the reference does (MAGNET.py:154,167-168).
  3. Learned convex upsampling of every post-initial prediction with a
     shared mask predicted from the D-Net decoder feature
     (MAGNET.py:171-173).

MAGNET_F (the F-Net training head, MAGNET.py:179-202) is `MagnetF` below:
F-Net features + fixed 80-plane sweep cost volume.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from magnet_tpu.models.dnet import DNetCoarse
from magnet_tpu.models.fnet import FNet
from magnet_tpu.nn.gnet import GNet
from magnet_tpu.nn.layers import Conv, relu
from magnet_tpu.ops.costvolume import cost_volume_cw, cost_volume_sweep
from magnet_tpu.ops.upsample import upsample_via_mask


def gaussian_sampling_offsets(sampling_range: float,
                              n_samples: int) -> np.ndarray:
    """k_list: bin centers (in sigma units) of n equal-probability bins of
    N(0,1) truncated to +-sampling_range (MAGNET.py:120-128)."""
    from scipy.special import erf
    from scipy.stats import norm
    p_total = erf(sampling_range / np.sqrt(2))
    idx = np.arange(0, n_samples + 1)
    p_list = (1 - p_total) / 2 + (idx / n_samples) * p_total
    k_list = norm.ppf(p_list)
    return ((k_list[1:] + k_list[:-1]) / 2).astype(np.float32)


class MagnetMaskHead(nn.Module):
    """MAGNET's learned-upsampling mask head: conv3x3 -> ReLU -> conv1x1 ->
    ReLU -> conv1x1 -> ReLU -> conv1x1 (4 convs, hidden 128;
    MAGNET.py:112-117). One conv DEEPER than the DenseDepth decoder's own
    3-conv mask head (D_dense_depth.py:156-160) — torch Sequential indices
    0/2/4/6 in released MAGNET checkpoints."""
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
                                  ("conv2", True), ("conv3", False))]
            return hc.head_chain_pallas(
                x, convs, interpret=_jax.default_backend() != "tpu")
        y = relu(Conv(self.hidden, 3, padding=1, name="conv0")(x))
        y = relu(Conv(self.hidden, 1, name="conv1")(y))
        y = relu(Conv(self.hidden, 1, name="conv2")(y))
        return Conv(self.out_ch, 1, name="conv3")(y)


def parse_weighting(weighting: str) -> float:
    """'CW5' -> kappa = 5.0 (MAGNET.py:159)."""
    if not weighting.startswith("CW"):
        raise ValueError(f"unsupported mvs weighting {weighting!r}")
    return float(weighting[2:])


def _frozen(cls):
    """Freeze a backbone at param-read: every variable passes through
    `stop_gradient` before use, so under `value_and_grad` the whole
    submodule is a differentiation constant — no JVP trace through its ops
    (the inference Pallas kernels have no JVP rule) and no backward
    compute, matching the reference's `torch.no_grad()` wrapping
    (MAGNET.py:133-144). Output-level stop_gradients are kept as
    documentation but are redundant after this."""
    return nn.map_variables(cls, True, trans_in_fn=jax.lax.stop_gradient,
                            init=True)


class Magnet(nn.Module):
    """Full pipeline. Inputs NHWC; poses/intrinsics as in ops.costvolume.

    Besides the monolithic ``__call__`` (the reference protocol,
    MAGNET.py:130-175), the frozen trunk work and the per-window fusion are
    exposed separately as ``encode`` / ``fuse`` for the streaming serving
    path: in video, every frame is re-encoded ~(V+1) times by the
    monolithic protocol (once as reference, V times as a neighbor) even
    though the frozen D-Net/F-Net outputs depend only on the frame itself.
    ``encode`` once per frame + ``fuse`` per window returns identical
    predictions while cutting steady-state per-frame work to one trunk
    pass (see eval/streaming.py, scripts/bench_streaming.py).
    """
    output_dim: int = 2
    downsample_ratio: int = 4
    use_bn: bool = True
    fnet_feature_dim: int = 64
    sampling_range: float = 3.0
    n_samples: int = 5
    mvs_weighting: str = "CW5"
    n_iters: int = 3
    dnet_feature_dim: int = 256

    def setup(self):
        self.d_net = _frozen(DNetCoarse)(
            output_dim=self.output_dim,
            downsample_ratio=self.downsample_ratio,
            use_bn=self.use_bn)
        self.f_net = _frozen(FNet)(feature_dim=self.fnet_feature_dim)
        self.g_net = GNet()
        self.mask_head = MagnetMaskHead(9 * self.downsample_ratio ** 2)

    def encode(self, imgs: jnp.ndarray, train: bool = False):
        """Frozen per-frame trunk features (frame-identity-dependent only).

        imgs: (N, H, W, 3) -> (gauss (N, h, w, 2) coarse (mu, sigma),
        feat_d (N, h, w, 256) decoder feature, feat_m (N, h, w, F) matching
        feature). The reference computes these under no_grad on
        cat(ref, nghbrs) every forward (MAGNET.py:133-144); they are pure
        functions of each frame, so the streaming path caches them.
        """
        mono, feat_d = self.d_net(imgs, train=False)
        feat_m = self.f_net(imgs, train=False)
        return (jax.lax.stop_gradient(mono),
                jax.lax.stop_gradient(feat_d),
                jax.lax.stop_gradient(feat_m))

    def fuse(self, ref_gauss: jnp.ndarray, x_d3: jnp.ndarray,
             ref_feat: jnp.ndarray, src_gauss: jnp.ndarray,
             src_feat: jnp.ndarray, src_R: jnp.ndarray, src_t: jnp.ndarray,
             is_valid: jnp.ndarray, intM: jnp.ndarray, rays2d: jnp.ndarray,
             train: bool = False, n_iters: int = None) -> List[jnp.ndarray]:
        """Iterative refinement + learned upsampling from encoded features.

        ref_gauss: (B, h, w, 2); x_d3: (B, h, w, 256); ref_feat:
        (B, h, w, F); src_gauss: (B, V, h, w, 2); src_feat: (B, V, h, w, F);
        poses/intrinsics as in ``__call__``.
        """
        n_iters = n_iters if n_iters is not None else self.n_iters
        kappa = parse_weighting(self.mvs_weighting)
        ks = jnp.asarray(gaussian_sampling_offsets(self.sampling_range,
                                                   self.n_samples))
        src_mu = src_gauss[..., 0]
        src_sigma = src_gauss[..., 1]

        # ---- Iterative Gaussian refinement (static unroll,
        # MAGNET.py:151-169). Hoist the iteration-invariant feature branch
        # of G-Net's first layer out of the loop (the decoder feature never
        # changes).
        feat_contrib = self.g_net.precompute_feature(x_d3, train)
        pred_list = [ref_gauss]
        for _ in range(n_iters):
            prev = jax.lax.stop_gradient(pred_list[-1])
            mu, sigma = prev[..., 0], prev[..., 1]
            d_volume = mu[..., None] + sigma[..., None] * ks   # (B,h,w,D)

            cv = cost_volume_cw(d_volume, ref_feat, src_feat, src_mu,
                                src_sigma, src_R, src_t, is_valid, intM,
                                rays2d, kappa)
            cv = jax.lax.stop_gradient(cv)

            new_pred = self.g_net(cv.astype(x_d3.dtype), feat_contrib,
                                  prev, train=train)
            pred_list.append(new_pred)

        # ---- Shared learned upsampling (MAGNET.py:171-173)
        k = self.downsample_ratio
        mask = self.mask_head(x_d3, train)
        return [upsample_via_mask(p, mask, k) for p in pred_list[1:]]

    def __call__(self, ref_img: jnp.ndarray, src_imgs: jnp.ndarray,
                 src_R: jnp.ndarray, src_t: jnp.ndarray,
                 is_valid: jnp.ndarray, intM: jnp.ndarray,
                 rays2d: jnp.ndarray, train: bool = False,
                 n_iters: int = None) -> List[jnp.ndarray]:
        """ref_img: (B, H, W, 3); src_imgs: (B, V, H, W, 3);
        src_R: (B, V, 3, 3); src_t: (B, V, 3); is_valid: (B, V);
        intM: (B, 3, 3); rays2d: (B, 3, h*w) at dpv resolution.
        Returns a list of n_iters upsampled (B, H, W, 2) (mu, sigma) maps.
        """
        B, V = src_imgs.shape[0], src_imgs.shape[1]
        H, W = ref_img.shape[1], ref_img.shape[2]

        # ---- Frozen single-view + matching backbones, one batched pass
        all_imgs = jnp.concatenate(
            [ref_img, src_imgs.reshape(B * V, H, W, 3)], axis=0)
        mono, feat_d, feat_m = self.encode(all_imgs, train=train)
        ref_gauss = mono[:B]                               # (B, h, w, 2)
        src_gauss = mono[B:].reshape(B, V, *mono.shape[1:])
        x_d3 = feat_d[:B]                                  # (B, h, w, 256)
        ref_feat = feat_m[:B]
        src_feat = feat_m[B:].reshape(B, V, *feat_m.shape[1:])

        return self.fuse(ref_gauss, x_d3, ref_feat, src_gauss, src_feat,
                         src_R, src_t, is_valid, intM, rays2d,
                         train=train, n_iters=n_iters)


class MagnetF(nn.Module):
    """F-Net training head: features + fixed-sweep cost volume
    (MAGNET.py:179-202). d_center: (D,) sweep depths.
    Returns (B, h, w, D) softmaxed cost volume."""
    fnet_feature_dim: int = 64
    remat: bool = False

    @nn.compact
    def __call__(self, ref_img, src_imgs, src_R, src_t, is_valid, intM,
                 rays2d, d_center, train: bool = False):
        B, V = src_imgs.shape[0], src_imgs.shape[1]
        H, W = ref_img.shape[1], ref_img.shape[2]
        all_imgs = jnp.concatenate(
            [ref_img, src_imgs.reshape(B * V, H, W, 3)], axis=0)
        feat = FNet(feature_dim=self.fnet_feature_dim, remat=self.remat,
                    name="f_net")(all_imgs, train=train)
        ref_feat = feat[:B]
        src_feat = feat[B:].reshape(B, V, *feat.shape[1:])
        return cost_volume_sweep(d_center, ref_feat, src_feat, src_R,
                                 src_t, is_valid, intM, rays2d)


def sid_depth_centers(d_min: float, d_max: float, n_bins: int) -> np.ndarray:
    """DORN-style SID sweep depths used for F-Net training
    (train_FNet.py:55-65): bin centers of exp(log(d_max + g) * i / N) - g
    with shift g = 1 - d_min, i = 0..N."""
    g = 1.0 - d_min
    idx = np.arange(n_bins + 1)
    edges = np.exp(np.log(d_max + g) * idx / n_bins) - g
    return ((edges[:-1] + edges[1:]) / 2).astype(np.float32)

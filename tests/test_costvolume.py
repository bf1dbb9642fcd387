"""Golden tests of the plane-sweep cost volumes against a torch oracle.

The oracle implements the documented reference math (SURVEY.md section 2.1
component 5 / homography.py semantics): P_pix = K@t + K@R@Ray2D * d,
normalize, clip +-10, grid_sample warp (bilinear/zeros/align_corners=False),
channel dot-product, consistency mask |z - mu_src| < kappa*sigma_src,
view-sum / V [+ softmax over D for the fixed sweep].
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from magnet_tpu.ops import costvolume


def _rand_pose(rng, scale=0.08):
    """Small random rotation + translation (valid-looking camera motion)."""
    w = rng.randn(3) * scale
    theta = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    R = np.eye(3) + np.sin(theta) / max(theta, 1e-8) * K + \
        (1 - np.cos(theta)) / max(theta, 1e-8) ** 2 * (K @ K)
    t = rng.randn(3) * 0.1
    return R.astype(np.float64), t.astype(np.float64)


def _setup(rng, B=2, V=3, D=5, H=12, W=16, C=8):
    fx, fy = W * 1.2, H * 1.6
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1.0]])
    grid = np.ones((H, W, 3))
    grid[:, :, 0] = np.arange(W)[None] + 0.5
    grid[:, :, 1] = np.arange(H)[:, None] + 0.5
    rays = grid.copy()
    rays[:, :, 0] = (grid[:, :, 0] - K[0, 2]) / K[0, 0]
    rays[:, :, 1] = (grid[:, :, 1] - K[1, 2]) / K[1, 1]
    rays2d = rays.transpose(2, 0, 1).reshape(3, -1)

    Rs = np.zeros((B, V, 3, 3))
    ts = np.zeros((B, V, 3))
    for b in range(B):
        for v in range(V):
            Rs[b, v], ts[b, v] = _rand_pose(rng)
    is_valid = (rng.rand(B, V) > 0.25).astype(np.float64)

    ref_feat = rng.randn(B, H, W, C)
    src_feat = rng.randn(B, V, H, W, C)
    src_mu = rng.uniform(1.0, 4.0, (B, V, H, W))
    src_sigma = rng.uniform(0.1, 0.8, (B, V, H, W))
    d_volume = rng.uniform(1.0, 4.0, (B, H, W, D))
    intM = np.broadcast_to(K, (B, 3, 3)).copy()
    rays_b = np.broadcast_to(rays2d, (B, 3, H * W)).copy()
    return dict(K=K, rays2d=rays2d, Rs=Rs, ts=ts, is_valid=is_valid,
                ref_feat=ref_feat, src_feat=src_feat, src_mu=src_mu,
                src_sigma=src_sigma, d_volume=d_volume, intM=intM,
                rays_b=rays_b, dims=(B, V, D, H, W, C))


def _torch_warp(feat_chw, x_pix, y_pix, H, W):
    """grid_sample at reference-normalized coords, clipped +-10."""
    gx = np.clip((x_pix - W / 2.0) / (W / 2.0), -10.0, 10.0)
    gy = np.clip((y_pix - H / 2.0) / (H / 2.0), -10.0, 10.0)
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1)).float()
    D = grid.shape[0]
    f = feat_chw[None].repeat(D, 1, 1, 1).float()
    return tF.grid_sample(f, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=False)   # (D, C, H, W)


def _oracle_cw(s, kappa):
    B, V, D, H, W, C = s["dims"]
    out = np.zeros((B, D, H, W))
    for b in range(B):
        for v in range(V):
            if s["is_valid"][b, v] == 0:
                continue
            R, t = s["Rs"][b, v], s["ts"][b, v]
            term1_pix = (s["K"] @ t).reshape(3, 1)
            term2_pix = (s["K"] @ R @ s["rays2d"])
            term2_cam = (R @ s["rays2d"])
            d = s["d_volume"][b].transpose(2, 0, 1).reshape(D, 1, -1)
            P_pix = term1_pix[None] + term2_pix[None] * d
            P_pix = P_pix / (P_pix[:, 2:3, :] + 1e-10)
            z = (t.reshape(3, 1)[None] + term2_cam[None] * d)[:, 2, :]
            z = z.reshape(D, H, W)
            x = P_pix[:, 0].reshape(D, H, W)
            y = P_pix[:, 1].reshape(D, H, W)

            sf = torch.from_numpy(s["src_feat"][b, v].transpose(2, 0, 1))
            wf = _torch_warp(sf, x, y, H, W).numpy()
            wmu = _torch_warp(torch.from_numpy(s["src_mu"][b, v][None]),
                              x, y, H, W).numpy()[:, 0]
            wsig = _torch_warp(torch.from_numpy(s["src_sigma"][b, v][None]),
                               x, y, H, W).numpy()[:, 0]

            fc = (s["ref_feat"][b].transpose(2, 0, 1)[None] * wf).sum(1)
            mask = (np.abs(z - wmu) < wsig * kappa).astype(np.float64)
            out[b] += fc * mask
    return out / V


def test_cost_volume_cw_matches_oracle():
    rng = np.random.RandomState(0)
    s = _setup(rng)
    kappa = 5.0
    ref = _oracle_cw(s, kappa)

    ours = costvolume.cost_volume_cw(
        jnp.asarray(s["d_volume"], jnp.float32),
        jnp.asarray(s["ref_feat"], jnp.float32),
        jnp.asarray(s["src_feat"], jnp.float32),
        jnp.asarray(s["src_mu"], jnp.float32),
        jnp.asarray(s["src_sigma"], jnp.float32),
        jnp.asarray(s["Rs"], jnp.float32), jnp.asarray(s["ts"], jnp.float32),
        jnp.asarray(s["is_valid"], jnp.float32),
        jnp.asarray(s["intM"], jnp.float32),
        jnp.asarray(s["rays_b"], jnp.float32), kappa)
    ours = np.moveaxis(np.asarray(ours), -1, 1)
    # Consistency mask is a hard threshold: exclude pixels where the
    # float32-vs-float64 boundary decision could legitimately differ.
    gap = np.abs(ref - ours)
    assert np.median(gap) < 1e-5
    assert (gap < 1e-3).mean() > 0.995


def test_cost_volume_sweep_matches_oracle():
    rng = np.random.RandomState(1)
    s = _setup(rng, D=7)
    B, V, D, H, W, C = s["dims"]
    d_center = np.linspace(1.0, 4.0, D)

    out = np.zeros((B, D, H, W))
    for b in range(B):
        for v in range(V):
            if s["is_valid"][b, v] == 0:
                continue
            R, t = s["Rs"][b, v], s["ts"][b, v]
            term1_pix = (s["K"] @ t).reshape(3, 1)
            term2_pix = (s["K"] @ R @ s["rays2d"])
            P_pix = term1_pix[None] + term2_pix[None] * \
                d_center.reshape(D, 1, 1)
            P_pix = P_pix / (P_pix[:, 2:3, :] + 1e-10)
            x = P_pix[:, 0].reshape(D, H, W)
            y = P_pix[:, 1].reshape(D, H, W)
            sf = torch.from_numpy(s["src_feat"][b, v].transpose(2, 0, 1))
            wf = _torch_warp(sf, x, y, H, W).numpy()
            out[b] += (s["ref_feat"][b].transpose(2, 0, 1)[None] * wf).sum(1)
    out = out / V
    ref = torch.softmax(torch.from_numpy(out), dim=1).numpy()

    ours = costvolume.cost_volume_sweep(
        jnp.asarray(d_center, jnp.float32),
        jnp.asarray(s["ref_feat"], jnp.float32),
        jnp.asarray(s["src_feat"], jnp.float32),
        jnp.asarray(s["Rs"], jnp.float32), jnp.asarray(s["ts"], jnp.float32),
        jnp.asarray(s["is_valid"], jnp.float32),
        jnp.asarray(s["intM"], jnp.float32),
        jnp.asarray(s["rays_b"], jnp.float32))
    ours = np.moveaxis(np.asarray(ours), -1, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


# ---- plane-sweep training backward (custom VJP, TPU scatter-free) -----
#
# Autodiff's gather-transpose is an XLA scatter the TPU backend
# serializes per index (F-Net training at the reference shape measured
# 32.6 s/backward and crashed the worker at >= 8 (batch, view) pairs).
# cost_volume_sweep's default backward replaces it with a windowed dense
# transpose; these tests pin it against autodiff (the `xla` escape path)
# where the windows cover every footprint.


def _sweep_grads(s, seed=0):
    import jax

    B, V, D, H, W, C = s["dims"]
    d_center = jnp.asarray(np.linspace(1.0, 4.0, D).astype(np.float32))
    args = tuple(jnp.asarray(a.astype(np.float32)) for a in (
        s["ref_feat"], s["src_feat"], s["Rs"], s["ts"], s["is_valid"],
        s["intM"], s["rays_b"]))
    rng = np.random.RandomState(seed)
    up = jnp.asarray(rng.randn(B, H, W, D).astype(np.float32))

    def loss(ref, src):
        cv = costvolume.cost_volume_sweep(d_center, ref, src, *args[2:])
        return jnp.sum(cv * up)

    return jax.grad(loss, argnums=(0, 1))(args[0], args[1])


def test_sweep_bwd_matches_autodiff(monkeypatch):
    rng = np.random.RandomState(3)
    s = _setup(rng, B=2, V=2, D=8, H=16, W=16, C=8)
    g_ref, g_src = _sweep_grads(s)
    monkeypatch.setenv("MAGNET_TPU_SWEEP_BWD", "xla")
    a_ref, a_src = _sweep_grads(s)
    assert np.abs(np.asarray(a_src)).max() > 1e-4   # non-degenerate
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(a_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_src), np.asarray(a_src),
                               rtol=1e-4, atol=1e-5)


def test_sweep_bwd_oob_samples_zero_grad(monkeypatch):
    """Projections far outside the source frame must contribute zero
    gradient in BOTH paths (grid_sample zeros semantics)."""
    rng = np.random.RandomState(4)
    s = _setup(rng, B=1, V=2, D=4, H=16, W=16, C=4)
    s["ts"] = s["ts"] + 100.0
    g_ref, g_src = _sweep_grads(s)
    assert float(np.abs(np.asarray(g_src)).max()) == 0.0
    assert float(np.abs(np.asarray(g_ref)).max()) == 0.0


def test_sweep_bwd_chunk_invariant(monkeypatch):
    """The D-chunk size is a memory knob, never a numerics knob."""
    rng = np.random.RandomState(5)
    s = _setup(rng, B=1, V=2, D=8, H=16, W=16, C=8)
    g_ref, g_src = _sweep_grads(s)
    monkeypatch.setenv("MAGNET_TPU_SWEEP_CHUNK", "2")
    c_ref, c_src = _sweep_grads(s)
    np.testing.assert_allclose(np.asarray(g_src), np.asarray(c_src),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(c_ref),
                               rtol=1e-6, atol=1e-7)


def test_sweep_bwd_pallas_matches_scan():
    """The fused Pallas grad-src kernel (interpret mode) must equal the
    XLA scan transpose — same windows, same weights, VMEM-resident
    accumulation instead of slice/update round trips."""
    import jax

    from magnet_tpu.kernels import sweepbwd_pallas as swb

    rng = np.random.RandomState(6)
    s = _setup(rng, B=2, V=2, D=4, H=16, W=16, C=8)
    B, V, D, H, W, C = s["dims"]
    d_center = jnp.asarray(np.linspace(1.0, 4.0, D).astype(np.float32))
    ref = jnp.asarray(s["ref_feat"].astype(np.float32))
    src_shape = s["src_feat"].shape
    gbar = jnp.asarray(rng.randn(B, D, H, W).astype(np.float32))
    args = tuple(jnp.asarray(a.astype(np.float32)) for a in (
        s["Rs"], s["ts"], s["is_valid"], s["intM"], s["rays_b"]))

    got = np.asarray(swb.sweep_grad_src_pallas(
        d_center, ref, src_shape, gbar, *args,
        matmul_dtype=jnp.float32, interpret=True))

    # the scan path's grad_src, extracted via the custom VJP with the
    # pallas branch unavailable (CPU backend never takes it)
    from magnet_tpu.ops.costvolume import _sweep_pre_cost

    def loss(src):
        cost = _sweep_pre_cost(d_center, ref, src, *args)
        return jnp.sum(cost * gbar)

    want = np.asarray(jax.grad(loss)(
        jnp.asarray(s["src_feat"].astype(np.float32))))
    assert np.abs(want).max() > 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sweep_bwd_pallas_supported_gate():
    from magnet_tpu.kernels import sweepbwd_pallas as swb
    assert swb.supported(120, 160, 64)          # ScanNet dpv
    assert not swb.supported(88, 304, 32)       # KITTI: VMEM (falls to scan)
    assert not swb.supported(120, 150, 64)      # chunk misaligned
    assert not swb.supported(12, 160, 64)       # window > image
    assert not swb.supported(120, 160, 127)     # channel overflow


def test_sweep_forward_rides_cw_kernel():
    """The TPU sweep forward routes through cost_volume_cw with the
    consistency check disabled (mu=0, sigma=1e30): verify the identity
    — the Pallas CW kernel (interpret) with those dummies equals the
    sweep gather path's pre-softmax cost to bf16-weight tolerance."""
    from magnet_tpu.kernels.costvolume_pallas import cost_volume_cw_pallas
    from magnet_tpu.ops.costvolume import _sweep_pre_cost_impl

    rng = np.random.RandomState(7)
    s = _setup(rng, B=1, V=2, D=5, H=16, W=32, C=8)
    B, V, D, H, W, C = s["dims"]
    d_center = jnp.asarray(np.linspace(1.0, 4.0, D).astype(np.float32))
    ref = jnp.asarray(s["ref_feat"].astype(np.float32))
    src = jnp.asarray(s["src_feat"].astype(np.float32))
    args = tuple(jnp.asarray(a.astype(np.float32)) for a in (
        s["Rs"], s["ts"], s["is_valid"], s["intM"], s["rays_b"]))

    want = np.asarray(_sweep_pre_cost_impl(
        d_center, ref, src, *args, allow_kernel=False))   # (B, D, H, W)

    dvol = jnp.broadcast_to(d_center[None, None, None, :], (B, H, W, D))
    mu = jnp.zeros((B, V, H, W), jnp.float32)
    sigma = jnp.full((B, V, H, W), 1e30, jnp.float32)
    cw = cost_volume_cw_pallas(dvol, ref, src, mu, sigma, *args, 1.0,
                               interpret=True)            # (B, H, W, D)
    got = np.moveaxis(np.asarray(cw), -1, 1) * V
    assert np.abs(want).max() > 0.01
    # atol 5e-5: the kernel's weight-pattern contraction and the gather
    # path's einsum associate the f32 sums differently (one element at
    # 2.6e-5 in this fixture); the CW kernel itself is pinned against
    # the XLA corner-block path at 2e-6 elsewhere.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)

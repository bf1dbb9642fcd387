"""Tests of losses, optimizers, train steps, and checkpointing."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from magnet_tpu.train import checkpoint, losses, optim, steps
from magnet_tpu.models.dnet import DNet
from magnet_tpu.models.magnet import Magnet, sid_depth_centers


def test_dnet_loss_matches_torch_semantics():
    rng = np.random.RandomState(0)
    pred = np.stack([rng.uniform(1, 5, (2, 8, 8)),
                     rng.uniform(0.01, 2, (2, 8, 8))], -1)
    gt = rng.uniform(0.5, 6, (2, 8, 8))
    mask = gt > 2.0

    ours = float(losses.dnet_loss(jnp.asarray(pred), jnp.asarray(gt),
                                  jnp.asarray(mask)))
    # torch-style masked indexing oracle
    mu, var = pred[..., 0][mask], pred[..., 1][mask]
    g = gt[mask]
    var = np.maximum(var, 1e-10)
    ref = np.mean((mu - g) ** 2 / (2 * var) + 0.5 * np.log(var))
    assert np.isclose(ours, ref, atol=1e-5)


def test_magnet_loss_gamma_weighting():
    rng = np.random.RandomState(1)
    gt = rng.uniform(1, 5, (1, 6, 6))
    mask = np.ones_like(gt, bool)
    preds = [jnp.asarray(np.stack([gt + 0.5, np.ones_like(gt)], -1)),
             jnp.asarray(np.stack([gt + 0.1, np.ones_like(gt)], -1))]
    total = float(losses.magnet_loss(preds, jnp.asarray(gt),
                                     jnp.asarray(mask), gamma=0.8))
    l0 = float(losses.magnet_loss(preds[:1], jnp.asarray(gt),
                                  jnp.asarray(mask), gamma=0.8))
    l1 = float(losses.magnet_loss(preds[1:], jnp.asarray(gt),
                                  jnp.asarray(mask), gamma=0.8))
    assert np.isclose(total, 0.8 * l0 + l1, atol=1e-6)


def test_soft_argmax_depth():
    cv = jnp.asarray(np.eye(4)[None, None].repeat(3, 1))  # (1, 3, 4, 4)
    d = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    out = losses.soft_argmax_depth(cv, d)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [1, 2, 3, 4])


def test_onecycle_schedule_shape():
    sched = optim.onecycle(3.57e-4, 1000)
    lrs = [float(sched(s)) for s in [0, 300, 999]]
    assert lrs[0] == pytest.approx(3.57e-4 / 25, rel=1e-3)
    assert lrs[1] == pytest.approx(3.57e-4, rel=1e-3)
    # torch OneCycleLR: final = (peak / div_factor) / final_div_factor
    assert lrs[2] == pytest.approx(3.57e-4 / 25 / 10000, rel=1.5)


def _tiny_magnet_batch(B=1, V=2, H=32, W=32):
    rng = np.random.RandomState(0)
    h, w = H // 4, W // 4
    fx = w * 1.2
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(3, -1)
    return {
        "ref_img": rng.rand(B, H, W, 3).astype(np.float32),
        "src_imgs": rng.rand(B, V, H, W, 3).astype(np.float32),
        "R": np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1)),
        "t": rng.randn(B, V, 3).astype(np.float32) * 0.02,
        "is_valid": np.ones((B, V), np.float32),
        "intM": np.tile(K, (B, 1, 1)),
        "rays2d": np.tile(rays, (B, 1, 1)),
        "depth": rng.uniform(1, 5, (B, H, W)).astype(np.float32),
        "depth_dpv": rng.uniform(1, 5, (B, h, w)).astype(np.float32),
    }


def test_magnet_train_step_updates_only_gnet_and_mask_head():
    model = Magnet(n_iters=1)
    batch = {k: jnp.asarray(v) for k, v in _tiny_magnet_batch().items()}
    variables = model.init(jax.random.PRNGKey(0), batch["ref_img"],
                           batch["src_imgs"], batch["R"], batch["t"],
                           batch["is_valid"], batch["intM"],
                           batch["rays2d"])
    tx = optim.make_magnet_optimizer(variables["params"], lr=1e-3,
                                     total_steps=10)
    state = steps.TrainState.create(variables, tx)
    step = steps.make_magnet_train_step(model, tx, gamma=0.8,
                                        max_depth=10.0, min_depth=1e-3,
                                        n_iters=1)
    p_before = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert changed(p_before["g_net"], state.params["g_net"])
    assert changed(p_before["mask_head"], state.params["mask_head"])
    assert not changed(p_before["d_net"], state.params["d_net"])
    assert not changed(p_before["f_net"], state.params["f_net"])


def test_dnet_train_step_decreases_loss():
    model = DNet()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    depth = jnp.asarray(rng.uniform(1, 5, (2, 32, 32)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    tx = optim.make_dnet_optimizer(variables["params"], lr=5e-3,
                                   total_steps=20, same_lr=True)
    state = steps.TrainState.create(variables, tx)
    step = steps.make_dnet_train_step(model, tx, max_depth=10.0,
                                      min_depth=1e-3)
    batch = {"img": img, "depth": depth}
    hist = []
    for _ in range(6):
        state, m = step(state, batch)
        hist.append(float(m["loss"]))
    assert min(hist[2:]) < hist[0]
    assert int(state.step) == 6


def test_checkpoint_roundtrip(tmp_path):
    model = DNet()
    img = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    tx = optim.make_dnet_optimizer(variables["params"], lr=1e-3,
                                   total_steps=10)
    state = steps.TrainState.create(variables, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = checkpoint.save(str(tmp_path / "ck"), state)
    assert "0000000007" in path
    restored = checkpoint.restore(str(tmp_path / "ck"), state)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_onecycle_beta1_matches_torch():
    """beta1 cycling parity with torch OneCycleLR's cycle_momentum=True
    (0.95 -> 0.85 -> 0.95, cosine, pct_start 0.3; train_DNet.py:56-57)."""
    import torch
    total = 40
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.AdamW([p], lr=1e-3, betas=(0.95, 0.999))
    sch = torch.optim.lr_scheduler.OneCycleLR(topt, max_lr=1e-3,
                                              total_steps=total)
    ours = optim.onecycle_beta1(total)
    tv, ov = [], []
    for step in range(total):
        tv.append(topt.param_groups[0]["betas"][0])
        ov.append(float(ours(step)))
        topt.step()
        sch.step()
    np.testing.assert_allclose(ov, tv, atol=1e-6)


def test_onecycle_finite_at_tiny_total_steps():
    """optax's cosine_onecycle divides by an int-truncated warmup length;
    total_steps <= 3 used to yield NaN LR and NaN every parameter after
    one step (caught driving train_FNet.py on the 4-sample synthetic
    set)."""
    for total in (1, 2, 3, 10):
        s = optim.onecycle(1e-4, total)
        vals = [float(s(i)) for i in range(total + 1)]
        assert np.isfinite(vals).all(), (total, vals)
        b = optim.onecycle_beta1(total)
        bvals = [float(b(i)) for i in range(total + 1)]
        assert np.isfinite(bvals).all(), (total, bvals)


def test_remat_grads_match_baseline():
    """--remat (nn.remat over backbone blocks) must not change gradients,
    only the backward-pass memory/compute schedule."""
    from magnet_tpu.models.fnet import FNet
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    m0, m1 = FNet(remat=False), FNet(remat=True)
    v = m0.init(jax.random.PRNGKey(0), img)

    def grads(m):
        def f(p):
            out, _ = m.apply({"params": p,
                              "batch_stats": v["batch_stats"]}, img,
                             train=True, mutable=["batch_stats"])
            return (out ** 2).mean()
        return jax.grad(f)(v["params"])

    for a, b in zip(jax.tree.leaves(grads(m0)), jax.tree.leaves(grads(m1))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

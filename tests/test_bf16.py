"""bf16 execution-path consistency: the bf16 matching path (feature
gathers in bf16, mu/sigma bit-exact via bitcast lanes) must track the f32
path within bf16 tolerance."""

import numpy as np

import jax
import jax.numpy as jnp

from magnet_tpu.core.dtypes import cast_floating
from magnet_tpu.models.magnet import Magnet
from magnet_tpu.ops import costvolume


def test_cost_volume_cw_bf16_tracks_f32():
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_costvolume import _setup
    rng = np.random.RandomState(2)
    s = _setup(rng)
    kappa = 5.0

    args = [jnp.asarray(s["d_volume"], jnp.float32),
            jnp.asarray(s["ref_feat"], jnp.float32),
            jnp.asarray(s["src_feat"], jnp.float32),
            jnp.asarray(s["src_mu"], jnp.float32),
            jnp.asarray(s["src_sigma"], jnp.float32),
            jnp.asarray(s["Rs"], jnp.float32),
            jnp.asarray(s["ts"], jnp.float32),
            jnp.asarray(s["is_valid"], jnp.float32),
            jnp.asarray(s["intM"], jnp.float32),
            jnp.asarray(s["rays_b"], jnp.float32)]
    f32_out = np.asarray(costvolume.cost_volume_cw(*args, kappa))

    args_bf = list(args)
    args_bf[1] = args[1].astype(jnp.bfloat16)
    args_bf[2] = args[2].astype(jnp.bfloat16)
    bf_out = np.asarray(costvolume.cost_volume_cw(*args_bf, kappa))

    # features and mu/sigma are bf16 (rel ~1e-2); the consistency mask
    # may flip only for pixels near the threshold boundary
    scale = np.abs(f32_out).max()
    gap = np.abs(f32_out - bf_out)
    assert np.median(gap) < 0.02 * scale
    same_zero = (f32_out == 0) == (bf_out == 0)
    assert same_zero.mean() > 0.98


def test_magnet_forward_bf16_finite():
    rng = np.random.RandomState(0)
    B, V, H, W = 1, 2, 64, 64
    h, w = H // 4, W // 4
    fx = 0.9 * w
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(3, -1)

    model = Magnet(n_iters=2)
    args = (jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
            jnp.asarray(rng.rand(B, V, H, W, 3), jnp.float32),
            jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, V, 1, 1))),
            jnp.asarray(rng.randn(B, V, 3).astype(np.float32) * 0.02),
            jnp.ones((B, V), jnp.float32),
            jnp.asarray(np.tile(K, (B, 1, 1))),
            jnp.asarray(np.tile(rays, (B, 1, 1))))
    variables = model.init(jax.random.PRNGKey(0), *args)

    v16 = {"params": cast_floating(variables["params"], jnp.bfloat16),
           "batch_stats": variables["batch_stats"]}
    args16 = (args[0].astype(jnp.bfloat16),
              args[1].astype(jnp.bfloat16)) + args[2:]
    preds = model.apply(v16, *args16)
    for p in preds:
        arr = np.asarray(p, np.float32)
        assert np.isfinite(arr).all()
        assert np.all(arr[..., 1] > 0)

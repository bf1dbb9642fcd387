"""Streaming (feature-cached) eval path: identical predictions, real
cache reuse across overlapping windows (magnet_tpu/eval/streaming.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from magnet_tpu.eval import streaming
from magnet_tpu.models.magnet import Magnet

H, W, V, B = 64, 96, 2, 1


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    h, w = H // 4, W // 4
    K = np.array([[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]],
                 np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(3, -1)
    return (jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
            jnp.asarray(rng.rand(B, V, H, W, 3), jnp.float32),
            jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                (B, V, 1, 1))),
            jnp.asarray(rng.randn(B, V, 3).astype(np.float32) * 0.05),
            jnp.ones((B, V), jnp.float32),
            jnp.asarray(np.tile(K, (B, 1, 1))),
            jnp.asarray(np.tile(rays, (B, 1, 1))))


@pytest.fixture(scope="module")
def model_and_vars():
    model = Magnet(n_iters=2)
    inputs = _inputs()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)
    return model, variables, inputs


def _batch(inputs, ids):
    ref, srcs, R, t, valid, intM, rays2d = inputs
    return {"ref_img": np.asarray(ref), "src_imgs": np.asarray(srcs),
            "R": np.asarray(R), "t": np.asarray(t),
            "is_valid": np.asarray(valid), "intM": np.asarray(intM),
            "rays2d": np.asarray(rays2d), "view_ids": [ids]}


def test_streaming_matches_monolithic(model_and_vars):
    model, variables, inputs = model_and_vars
    ref = model.apply(variables, *inputs, train=False)[-1]

    forward, cache = streaming.make_streaming_forward(
        model, variables, lambda v: v, lambda x: x, n_iters=2)
    out = forward(_batch(inputs, ["s/ref", "s/a", "s/b"]))
    # encode at batch 1 vs the monolithic batch V+1 changes XLA's internal
    # conv tiling -> ~1e-5 relative float noise (amplified in magnitude by
    # the random-init net); the computation is otherwise identical.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert cache.misses == V + 1 and cache.hits == 0


def test_cache_reuse_and_eviction(model_and_vars):
    model, variables, inputs = model_and_vars
    forward, cache = streaming.make_streaming_forward(
        model, variables, lambda v: v, lambda x: x, n_iters=1,
        max_frames=3)
    # window 1: three distinct frames
    forward(_batch(inputs, ["s/0", "s/1", "s/2"]))
    assert (cache.hits, cache.misses) == (0, 3)
    # window 2 shares two frames with window 1 -> 2 hits, 1 miss
    forward(_batch(inputs, ["s/1", "s/2", "s/3"]))
    assert (cache.hits, cache.misses) == (2, 4)
    # LRU capacity 3: "s/0" was evicted, re-encoding it is a miss
    forward(_batch(inputs, ["s/0", "s/2", "s/3"]))
    assert cache.misses == 5 and cache.hits == 4


def test_streaming_rejects_bad_ids(model_and_vars):
    model, variables, inputs = model_and_vars
    forward, _ = streaming.make_streaming_forward(
        model, variables, lambda v: v, lambda x: x, n_iters=1)
    with pytest.raises(ValueError):
        forward(_batch(inputs, ["s/ref", "s/a"]))    # V+1 = 3 expected


def test_loaders_emit_view_ids():
    """The synthetic multiview pipeline carries view_ids through collate
    (ref first, then sources; unique per sample by design)."""
    from magnet_tpu.core import config
    from magnet_tpu.data import make_multiview_loader
    argv = ["--exp_name", "t", "--exp_dir", "/tmp/magnet_view_ids",
            "--DNET_ckpt", "none", "--FNET_ckpt", "none",
            "--dataset_name", "synthetic", "--dataset_path", "/tmp",
            "--input_height", str(H), "--input_width", str(W),
            "--dpv_height", str(H // 4), "--dpv_width", str(W // 4),
            "--MAGNET_num_source_views", str(V), "--synthetic_length", "2"]
    args = config.parse_args(config.build_test_magnet_parser(), argv)
    loader = make_multiview_loader(args, "test")
    batch = next(iter(loader))
    ids = batch["view_ids"][0]
    assert len(ids) == V + 1
    assert len(set(ids)) == V + 1
    assert all(i.startswith("synthetic/") for i in ids)

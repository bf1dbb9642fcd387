"""Multi-device (8 virtual CPU devices) sharding tests: the TPU-native
replacement for the reference's DDP path (train_DNet.py:180-212)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from magnet_tpu.core import mesh as mesh_lib
from magnet_tpu.models.dnet import DNet
from magnet_tpu.train import optim, steps


def test_mesh_has_8_devices():
    m = mesh_lib.make_mesh()
    assert m.devices.size == 8


def test_no_distributed_forces_single_device_mesh():
    """--no_distributed = the reference's single-process path
    (train_DNet.py:206-210): a 1-device mesh regardless of batch size."""
    import argparse

    from magnet_tpu.core import config

    req = ["--exp_name", "t", "--exp_dir", "/tmp/e", "--output_dim", "2",
           "--output_type", "G", "--DNET_architecture", "DenseDepth_BN",
           "--dataset_name", "synthetic", "--dataset_path", "/tmp/none"]
    args = config.build_train_dnet_parser().parse_args(
        req + ["--no_distributed", "--batch_size", "8"])
    assert args.distributed is False
    assert mesh_lib.mesh_from_args(args).devices.size == 1
    on = config.build_train_dnet_parser().parse_args(
        req + ["--distributed"])
    assert on.distributed is True
    assert mesh_lib.mesh_from_args(
        argparse.Namespace(distributed=True, mesh_shape="auto",
                           batch_size=8)).devices.size == 8


def test_sharded_dnet_train_step_matches_single_device():
    """A data-parallel step over the 8-device mesh must produce the same
    update as the single-device computation (global batch stats == SyncBN,
    gradients averaged over the global batch)."""
    model = DNet()
    rng = np.random.RandomState(0)
    img = rng.rand(8, 32, 32, 3).astype(np.float32)
    depth = rng.uniform(1, 5, (8, 32, 32)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img[:1]))
    tx = optim.make_dnet_optimizer(variables["params"], lr=1e-3,
                                   total_steps=10)
    step = steps.make_dnet_train_step(model, tx, max_depth=10.0,
                                      min_depth=1e-3)

    def fresh(v):
        # the step donates its input state; give each state its own buffers
        return jax.tree.map(jnp.array, v)

    # Single device
    state1 = steps.TrainState.create(fresh(variables), tx)
    state1, m1 = step(state1, {"img": jnp.asarray(img),
                               "depth": jnp.asarray(depth)})

    # Sharded across the mesh
    m = mesh_lib.make_mesh()
    state2 = steps.TrainState.create(fresh(variables), tx)
    state2 = mesh_lib.replicate(m, state2)
    batch = mesh_lib.shard_batch(m, {"img": jnp.asarray(img),
                                     "depth": jnp.asarray(depth)})
    state2, m2 = step(state2, batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    # Adam normalizes near-zero gradients to +-lr, so psum reduction-order
    # noise can flip single-element updates; bound the check by ~2x the
    # first-step update magnitude (catches unsynced gradients, which
    # would differ at parameter scale).
    for a, b in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4)
    # Batch stats must be the global-batch stats on every replica
    # (reduction-order fp noise allowed).
    for a, b in zip(jax.tree.leaves(state1.batch_stats),
                    jax.tree.leaves(state2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_view_sharded_inference_matches_single_device():
    """Sharding the source-view axis across the mesh (psum over ICI for
    the view-sum) must reproduce single-device inference."""
    from magnet_tpu.core.sharding_inference import (shard_magnet_inference,
                                                    view_mesh)
    from magnet_tpu.models.magnet import Magnet

    rng = np.random.RandomState(0)
    B, V, H, W = 1, 4, 32, 32
    h, w = H // 4, W // 4
    fx = 0.9 * w
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(3, -1)

    args = (jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
            jnp.asarray(rng.rand(B, V, H, W, 3), jnp.float32),
            jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                (B, V, 1, 1))),
            jnp.asarray(rng.randn(B, V, 3).astype(np.float32) * 0.02),
            jnp.ones((B, V), jnp.float32),
            jnp.asarray(np.tile(K, (B, 1, 1))),
            jnp.asarray(np.tile(rays, (B, 1, 1))))

    model = Magnet(n_iters=1)
    variables = model.init(jax.random.PRNGKey(0), *args)

    single = model.apply(variables, *args, train=False, n_iters=1)[-1]

    mesh = view_mesh(4)       # 4 of the 8 CPU devices, V=4
    fwd = shard_magnet_inference(model, variables, mesh, n_iters=1)
    sharded = fwd(*args)

    a, b = np.asarray(single), np.asarray(sharded)
    # psum reduction order differs; random-init magnitudes are huge, so
    # compare against the global scale
    np.testing.assert_allclose(a, b, rtol=1e-3,
                               atol=1e-5 * np.abs(a).max())


def test_shard_batch_places_on_data_axis():
    m = mesh_lib.make_mesh()
    x = np.zeros((16, 4), np.float32)
    y = mesh_lib.shard_batch(m, x)
    assert y.sharding.spec == P(mesh_lib.DATA_AXIS)

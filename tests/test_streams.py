"""Multi-stream serving (serve/streams.py): per-stream outputs must match
the single-stream forward, and the compiled program must contain NO
cross-device collectives — the structural guarantee that aggregate
throughput scales linearly with devices (VERDICT r2 "Next #3")."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magnet_tpu.core import mesh as mesh_lib
from magnet_tpu.models.magnet import Magnet
from magnet_tpu.serve import streams


def _stream_batch(S, V=2, H=32, W=32, seed=0):
    rng = np.random.RandomState(seed)
    h, w = H // 4, W // 4
    fx = 0.9 * w
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1.0]], np.float32)
    grid = np.ones((h, w, 3), np.float32)
    grid[:, :, 0] = (np.arange(w)[None] + 0.5 - K[0, 2]) / K[0, 0]
    grid[:, :, 1] = (np.arange(h)[:, None] + 0.5 - K[1, 2]) / K[1, 1]
    rays = grid.transpose(2, 0, 1).reshape(3, -1)
    return {
        "ref_img": rng.rand(S, H, W, 3).astype(np.float32),
        "src_imgs": rng.rand(S, V, H, W, 3).astype(np.float32),
        "R": np.tile(np.eye(3, dtype=np.float32), (S, V, 1, 1)),
        "t": rng.randn(S, V, 3).astype(np.float32) * 0.02,
        "is_valid": np.ones((S, V), np.float32),
        "intM": np.tile(K, (S, 1, 1)),
        "rays2d": np.tile(rays, (S, 1, 1)),
    }


@pytest.fixture(scope="module")
def setup():
    mesh = mesh_lib.make_mesh()
    S = mesh.devices.size
    batch = _stream_batch(S)
    model = Magnet(n_iters=1)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["ref_img"][:1]),
        jnp.asarray(batch["src_imgs"][:1]), jnp.asarray(batch["R"][:1]),
        jnp.asarray(batch["t"][:1]), jnp.asarray(batch["is_valid"][:1]),
        jnp.asarray(batch["intM"][:1]), jnp.asarray(batch["rays2d"][:1]))
    return mesh, model, variables, batch


def test_streams_match_single_stream(setup):
    mesh, model, variables, batch = setup
    S = mesh.devices.size
    run = streams.make_multistream_forward(model, mesh=mesh, n_iters=1)
    out = np.asarray(run(variables, streams.shard_streams(mesh, batch)))
    assert out.shape[0] == S

    solo = jax.jit(lambda v, *a: model.apply(v, *a, train=False,
                                             n_iters=1)[-1])
    for s in range(0, S, max(1, S // 4)):       # spot-check 4 streams
        want = np.asarray(solo(
            variables, *(jnp.asarray(batch[k][s:s + 1]) for k in
                         ("ref_img", "src_imgs", "R", "t", "is_valid",
                          "intM", "rays2d"))))
        np.testing.assert_allclose(out[s:s + 1], want, atol=1e-5,
                                   rtol=1e-5)


def test_streams_compile_without_collectives(setup):
    mesh, model, variables, batch = setup
    run = streams.make_multistream_forward(model, mesh=mesh, n_iters=1)
    sharded = streams.shard_streams(mesh, batch)
    lowered = run.jitted.lower(variables, sharded["ref_img"],
                               sharded["src_imgs"], sharded["R"],
                               sharded["t"], sharded["is_valid"],
                               sharded["intM"], sharded["rays2d"])
    hlo = lowered.compile().as_text()
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter"):
        assert op not in hlo, f"unexpected collective {op} in serving HLO"

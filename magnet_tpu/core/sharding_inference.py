"""View-sharded multi-view inference.

At inference the batch is 1 (test_MaGNet.py:36), so data parallelism has
nothing to split. The multi-view stage, however, is embarrassingly
parallel over source views: each view's plane-sweep warp + matching is
independent and the cost volume is a sum over views
(ops/costvolume.py). Sharding the view axis across a mesh makes XLA
partition the per-view gathers/matching and insert one psum for the
view-sum over ICI; the (small) frozen-backbone pass on V+1 frames shards
its frame batch the same way.

Usage:
    mesh = view_mesh(n)                      # ('view',) axis
    fwd = shard_magnet_inference(model, variables, mesh, n_iters)
    pred = fwd(ref_img, src_imgs, R, t, is_valid, intM, rays2d)

V must be divisible by the mesh size.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"


def view_mesh(n_devices: int = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (VIEW_AXIS,))


def shard_magnet_inference(model, variables, mesh: Mesh, n_iters: int):
    """Returns a jitted forward with the view axis of all per-view inputs
    sharded across ``mesh`` (replicated params/ref inputs)."""
    rep = NamedSharding(mesh, P())
    view1 = NamedSharding(mesh, P(None, VIEW_AXIS))   # (B, V, ...)

    variables = jax.device_put(variables, rep)

    @jax.jit
    def forward(ref_img, src_imgs, R, t, is_valid, intM, rays2d):
        preds = model.apply(variables, ref_img, src_imgs, R, t, is_valid,
                            intM, rays2d, train=False, n_iters=n_iters)
        return preds[-1]

    def run(ref_img, src_imgs, R, t, is_valid, intM, rays2d):
        ref_img = jax.device_put(ref_img, rep)
        src_imgs = jax.device_put(src_imgs, view1)
        R = jax.device_put(R, view1)
        t = jax.device_put(t, view1)
        is_valid = jax.device_put(is_valid, view1)
        intM = jax.device_put(intM, rep)
        rays2d = jax.device_put(rays2d, rep)
        return forward(ref_img, src_imgs, R, t, is_valid, intM, rays2d)

    return run

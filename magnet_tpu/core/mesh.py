"""Device mesh and sharding helpers.

The reference parallelizes with one process per GPU + NCCL DDP
(train_DNet.py:180-212,298-324). The TPU-native design is single-controller:
one `jax.sharding.Mesh` over all chips, with a data axis ("data") for batch
parallelism and an optional "view" axis used by the multi-view cost volume to
spread (view x depth-candidate) work at inference. Gradients are reduced by
XLA collectives inserted automatically from sharding annotations; SyncBN
falls out for free because batch statistics are computed over the *global*
(sharded) batch axis under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) are visible "
                f"(platform={devices[0].platform}); for virtual devices set "
                "XLA_FLAGS=--xla_force_host_platform_device_count=N with "
                "JAX_PLATFORMS=cpu before importing jax")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def mesh_from_args(args) -> Mesh:
    """Data mesh from flags; 'auto' uses the most devices that evenly
    divide the global batch size (a 2-sample batch on an 8-chip host runs
    2-way)."""
    if not getattr(args, "distributed", True):
        return make_mesh(1)
    spec = getattr(args, "mesh_shape", "auto")
    n_avail = len(jax.devices())
    if spec in ("auto", "", None):
        batch = int(getattr(args, "batch_size", 0) or 0)
        if batch <= 0:
            return make_mesh()
        n = max(d for d in range(1, n_avail + 1) if batch % d == 0)
        return make_mesh(n)
    return make_mesh(min(int(spec), n_avail))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of host arrays with leading batch dim onto the mesh,
    split along the data axis (the jax equivalent of DistributedSampler +
    H2D copies in the reference's per-rank loop, train_DNet.py:79-82)."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)

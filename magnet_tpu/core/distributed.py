"""Multi-host process initialization.

The reference's multi-node story is `dist.init_process_group('nccl', ...)`
with the node list hardcoded to one machine (train_DNet.py:301-309) — it
never actually runs multi-node. The TPU-native replacement is a single
call to `jax.distributed.initialize()` per host process, after which
`jax.devices()` spans the whole slice, `make_mesh()` builds a global mesh,
and the data loaders' `jax.process_index()/process_count()` epoch sharding
(data/scannet.py:207-208, base.Loader._indices) becomes the
DistributedSampler.

Env-guarded and a no-op when unset, so single-process runs (and the test
suite's virtual-CPU mesh) are untouched:

  MAGNET_TPU_DIST=1               enable. On TPU pods jax auto-detects the
                                  coordinator and process ids from the
                                  runtime metadata, so this alone is
                                  enough there.
  MAGNET_TPU_COORDINATOR=ip:port  explicit coordinator address
  MAGNET_TPU_NUM_PROCESSES=N      explicit process count
  MAGNET_TPU_PROCESS_ID=K         explicit rank of this process
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize_distributed(env=None, _init_fn=None) -> bool:
    """Call jax.distributed.initialize() when MAGNET_TPU_DIST=1; returns
    whether distributed mode is active. Idempotent. ``env``/``_init_fn``
    exist for unit tests (tests/test_distributed.py)."""
    global _initialized
    e = os.environ if env is None else env
    if e.get("MAGNET_TPU_DIST", "").lower() not in ("1", "true", "on"):
        return False
    if _initialized:
        return True

    kwargs = {}
    if e.get("MAGNET_TPU_COORDINATOR"):
        kwargs["coordinator_address"] = e["MAGNET_TPU_COORDINATOR"]
    if e.get("MAGNET_TPU_NUM_PROCESSES"):
        kwargs["num_processes"] = int(e["MAGNET_TPU_NUM_PROCESSES"])
    if e.get("MAGNET_TPU_PROCESS_ID"):
        kwargs["process_id"] = int(e["MAGNET_TPU_PROCESS_ID"])

    if _init_fn is None:                                # pragma: no cover
        import jax
        _init_fn = jax.distributed.initialize
    _init_fn(**kwargs)
    _initialized = True
    return True

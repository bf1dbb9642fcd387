"""Cross-chip multi-stream serving: one video stream per device.

Round-2 measured batch>1 multi-stream serving NEGATIVE on a single chip
(docs/ROADMAP.md): the serving-path kernels (Pallas cost volume, G-Net,
heads) are B=1 designs and batching collapsed throughput. The scaling
axis that does work is devices: S independent streams, one per chip,
dispatched as ONE jitted shard_map program over a 1-D mesh. Each shard
sees local batch 1, so the exact single-stream compiled path — Pallas
kernels included (ops/costvolume.py gates on the LOCAL shape) — runs per
device, and there is no cross-device communication at all (asserted in
tests/test_streams.py by scanning the compiled HLO for collectives), so
aggregate throughput is streams x single-chip fps by construction, modulo
host dispatch.

Replaces: the reference has no serving story; its eval loop is one GPU,
one image at a time (test_MaGNet.py:36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from magnet_tpu.core import mesh as mesh_lib


def make_multistream_forward(model, mesh=None, n_iters: int = 3):
    """Returns forward(cvars, batch) -> (S, h, w, 2) final predictions.

    ``batch`` is a dict of stream-stacked arrays with leading axis
    S == mesh size: ref_img (S,H,W,3), src_imgs (S,V,H,W,3), R (S,V,3,3),
    t (S,V,3), is_valid (S,V), intM (S,3,3), rays2d (S,3,N). Each stream
    is an independent window; there is no cross-stream semantics.
    ``cvars`` are apply-ready (compute-dtype cast) model variables,
    replicated to every device.
    """
    mesh = mesh or mesh_lib.make_mesh()
    data = mesh_lib.DATA_AXIS
    spec = P(data)

    def per_stream(cvars, ref, src, R, t, valid, K, rays):
        # Local shapes are (1, ...): the exact B=1 serving path.
        return model.apply(cvars, ref, src, R, t, valid, K, rays,
                           train=False, n_iters=n_iters)[-1]

    # check_vma=False: the body contains pallas_calls (cost volume,
    # G-Net, heads engage at the local B=1 shape on TPU), whose
    # out_shape ShapeDtypeStructs carry no varying-mesh-axes annotation
    # — jax's default vma check rejects that, yet the property it
    # guards (no unintended cross-device variance) is vacuous here:
    # the program has no collectives at all, which tests/test_streams.py
    # asserts directly on the compiled HLO. (Caught on the real chip:
    # the CPU-mesh tests never engage Pallas, so only TPU hits this.)
    shmap = jax.shard_map(
        per_stream, mesh=mesh,
        in_specs=(P(), spec, spec, spec, spec, spec, spec, spec),
        out_specs=spec, check_vma=False)

    @jax.jit
    def forward(cvars, ref, src, R, t, valid, K, rays):
        return shmap(cvars, ref, src, R, t, valid, K, rays)

    def run(cvars, batch):
        return forward(cvars, batch["ref_img"], batch["src_imgs"],
                       batch["R"], batch["t"], batch["is_valid"],
                       batch["intM"], batch["rays2d"])

    run.jitted = forward
    run.mesh = mesh
    return run


def shard_streams(mesh, batch):
    """Place a host-side stream-stacked batch with one stream per device."""
    return mesh_lib.shard_batch(mesh, batch)

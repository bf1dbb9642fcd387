"""The driver-facing multichip dryrun must be a CORRECTNESS check, not a
liveness check (VERDICT r2 "Next #2"): it runs the identical full-batch
MaGNet train step on the n-device mesh and a 1-device mesh and asserts
loss equivalence in a sane numeric regime. These tests run the real impl
on the suite's 8 virtual CPU devices and prove a deliberately-broken
sharding fails it."""

import numpy as np
import pytest

import jax

import __graft_entry__ as graft
from magnet_tpu.core import mesh as mesh_lib


def test_dryrun_impl_green(capsys):
    graft._dryrun_multichip_impl(len(jax.devices()))
    out = capsys.readouterr().out
    assert "ok" in out and "rel_delta" in out
    # the printed loss must be in a sane regime, not 9.2e29
    loss = float(out.split("loss=")[1].split(",")[0])
    assert 0.0 < loss < 1e4, out


def test_dryrun_catches_same_data_everywhere():
    """Simulates the classic data-partition bug (every rank loads shard
    0's examples): the sharded loss then disagrees with the true
    full-batch loss and the equivalence assertion must trip."""

    def broken(mesh, tree):
        if mesh.devices.size > 1:
            tree = jax.tree.map(
                lambda x: np.repeat(np.asarray(x)[:1], np.asarray(x).shape[0],
                                    axis=0), tree)
        return mesh_lib.shard_batch(mesh, tree)

    with pytest.raises(AssertionError, match="mismatch"):
        graft._dryrun_multichip_impl(len(jax.devices()), _shard_fn=broken)

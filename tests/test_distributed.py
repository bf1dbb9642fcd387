"""Multi-host wiring tests (VERDICT r2 "Next #5"): env-guarded
jax.distributed.initialize + the per-host epoch partition that replaces
the reference's DistributedSampler (data/dataloader_scannet.py:48-49)."""

import numpy as np

import jax

from magnet_tpu.core import distributed
from magnet_tpu.data import base, scannet


class _Args:
    batch_size = 2
    seed = 0
    workers = 1


class _DummyDataset:
    def __len__(self):
        return 64

    def get(self, idx, rng):
        return {"x": np.full((2,), idx, np.float32)}


def test_initialize_disabled_by_default():
    calls = []
    assert distributed.maybe_initialize_distributed(
        env={}, _init_fn=lambda **kw: calls.append(kw)) is False
    assert calls == []


def test_initialize_parses_env(monkeypatch):
    monkeypatch.setattr(distributed, "_initialized", False)
    calls = []
    env = {"MAGNET_TPU_DIST": "1",
           "MAGNET_TPU_COORDINATOR": "10.0.0.1:1234",
           "MAGNET_TPU_NUM_PROCESSES": "2",
           "MAGNET_TPU_PROCESS_ID": "1"}
    assert distributed.maybe_initialize_distributed(
        env=env, _init_fn=lambda **kw: calls.append(kw)) is True
    assert calls == [{"coordinator_address": "10.0.0.1:1234",
                      "num_processes": 2, "process_id": 1}]
    # idempotent: a second call must not re-initialize
    assert distributed.maybe_initialize_distributed(
        env=env, _init_fn=lambda **kw: calls.append(kw)) is True
    assert len(calls) == 1
    monkeypatch.setattr(distributed, "_initialized", False)


def test_auto_detect_passes_no_kwargs(monkeypatch):
    monkeypatch.setattr(distributed, "_initialized", False)
    calls = []
    distributed.maybe_initialize_distributed(
        env={"MAGNET_TPU_DIST": "1"},
        _init_fn=lambda **kw: calls.append(kw))
    assert calls == [{}]        # TPU-pod auto-detection path
    monkeypatch.setattr(distributed, "_initialized", False)


def test_loader_wires_process_sharding(monkeypatch):
    """Two mocked host processes must see the loader partition the epoch:
    the scannet loader factory forwards jax.process_index/count, and the
    resulting per-host index streams are disjoint and cover the shuffled
    epoch (up to drop_last)."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    seen = {}
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        loader = scannet._make_loader(_DummyDataset(), _Args(), "train")
        assert loader.host_count == 2 and loader.host_index == rank
        seen[rank] = set(int(b["x"][i, 0]) for b in loader
                         for i in range(b["x"].shape[0]))
    assert seen[0].isdisjoint(seen[1])
    assert len(seen[0] | seen[1]) == 64     # full cover, 64 % (2*2) == 0


def test_mesh_spans_all_visible_devices():
    """After jax.distributed.initialize, jax.devices() is global across
    hosts; make_mesh() must build over ALL of them (not local_devices) —
    on the suite's virtual backend that is the full 8-device set."""
    from magnet_tpu.core import mesh as mesh_lib
    assert mesh_lib.make_mesh().devices.size == len(jax.devices())


def test_single_host_loader_unchanged():
    loader = base.Loader(_DummyDataset(), batch_size=2, train=True,
                         num_workers=1)
    idx = {int(b["x"][i, 0]) for b in loader for i in range(2)}
    assert len(idx) == 64

"""Unit tests for the persistent-compilation-cache opt-in
(magnet_tpu/core/cache.py). Entry mains call enable_compilation_cache();
library code must not, so JAX defaults stay untouched elsewhere."""

import os

import jax

from magnet_tpu.core.cache import enable_compilation_cache


def test_enable_sets_cache_dir(tmp_path, monkeypatch):
    target = str(tmp_path / "jaxcache")
    monkeypatch.setenv("MAGNET_TPU_CACHE_DIR", target)
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert enable_compilation_cache() == target
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_explicit_path_beats_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MAGNET_TPU_CACHE_DIR", str(tmp_path / "env"))
    prev = jax.config.jax_compilation_cache_dir
    try:
        explicit = str(tmp_path / "explicit")
        assert enable_compilation_cache(explicit) == explicit
        assert jax.config.jax_compilation_cache_dir == explicit
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_empty_env_disables(monkeypatch):
    monkeypatch.setenv("MAGNET_TPU_CACHE_DIR", "")
    prev = jax.config.jax_compilation_cache_dir
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev


def test_entry_points_opt_in():
    """Every CLI main (and bench.py) enables the cache; library modules
    never do (tests/embedders keep JAX defaults)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    entries = ["train_DNet.py", "train_FNet.py", "train_MaGNet.py",
               "test_DNet.py", "test_MaGNet.py", "bench.py"]
    for name in entries:
        with open(os.path.join(repo, name)) as f:
            assert "enable_compilation_cache" in f.read(), name
    for root, _, files in os.walk(os.path.join(repo, "magnet_tpu")):
        for name in files:
            if not name.endswith(".py") or name == "cache.py":
                continue
            with open(os.path.join(root, name)) as f:
                assert "enable_compilation_cache" not in f.read(), (
                    f"library module {name} must not opt into the cache")


def test_mosaic_key_stabilizer_applies():
    """The Mosaic location-strip patch must attach on this jax version
    (returns False on layout drift — which would silently bring back
    per-edit cache-key churn; see core/cache.py docstring)."""
    from magnet_tpu.core.cache import _stabilize_mosaic_cache_keys
    assert _stabilize_mosaic_cache_keys() is True
    # idempotent
    assert _stabilize_mosaic_cache_keys() is True


def test_seed_compilation_cache(tmp_path):
    """Seeding copies committed entries once and never overwrites."""
    from magnet_tpu.core.cache import seed_compilation_cache
    seed = tmp_path / "seed"
    live = tmp_path / "live"
    seed.mkdir()
    (seed / "jit_x-abc-cache").write_bytes(b"exec")
    (seed / "notacache.txt").write_bytes(b"skip")
    assert seed_compilation_cache(str(live), str(seed)) == 1
    assert (live / "jit_x-abc-cache").read_bytes() == b"exec"
    assert not (live / "notacache.txt").exists()
    (live / "jit_x-abc-cache").write_bytes(b"newer")
    assert seed_compilation_cache(str(live), str(seed)) == 0
    assert (live / "jit_x-abc-cache").read_bytes() == b"newer"

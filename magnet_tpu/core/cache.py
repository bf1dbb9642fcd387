"""Persistent XLA compilation cache for the entry points.

The reference has no equivalent (PyTorch eager needs none); under jit
every (shape, dtype) signature compiles once per process, and on TPU a
cold compile of the full pipeline takes minutes. Opting into JAX's
persistent compilation cache makes repeated CLI runs in one container —
eval sweeps over several configs, bench re-runs, restarted trainings —
reuse the compiled executables across processes.

Opt-out with MAGNET_TPU_CACHE_DIR="" (empty); point it elsewhere to
relocate. Library code never calls this — only entry mains do, so tests
and embedders keep JAX's defaults.
"""

from __future__ import annotations

import os
import shutil

_DEFAULT = "/tmp/magnet_tpu_jaxcache"
# Repo-committed warm-start executables for the flagship bench/entry
# programs (a few MB): a FRESH container's first `python bench.py` would
# otherwise pay the full ~15 min cold XLA compile of the guarded pipeline
# through the TPU tunnel — longer than the driver's bench budget
# (BENCH_r04 rc=124). Seeding turns that first run into a warm run.
# Entries are keyed by jax/libtpu build + program fingerprint, so a
# mismatched environment simply misses and recompiles (correctness is
# never affected); refresh with scripts/refresh_cache_seed.py.
_SEED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "ckpts", "jaxcache_seed")


def seed_compilation_cache(cache_dir: str,
                           seed_dir: str | None = None) -> int:
    """Copy committed cache entries into the live cache dir (skip ones
    already present). Returns the number of entries copied."""
    src = seed_dir or _SEED_DIR
    n = 0
    try:
        if not os.path.isdir(src):
            return 0
        os.makedirs(cache_dir, exist_ok=True)
        for name in os.listdir(src):
            if not name.endswith("-cache"):
                continue
            dst = os.path.join(cache_dir, name)
            if os.path.exists(dst):
                continue
            shutil.copyfile(os.path.join(src, name), dst)
            n += 1
    except OSError:
        return n
    return n


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the on-disk compile cache; returns the directory or None
    when disabled. Safe on any backend and on old jax (best-effort)."""
    p = path if path is not None else os.environ.get(
        "MAGNET_TPU_CACHE_DIR", _DEFAULT)
    if not p:
        return None
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", p)
    except Exception:
        return None
    try:
        # cache programs that take >=2 s to compile (the default
        # threshold skips fast compiles; entry-point programs are big)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass
    seed_compilation_cache(p)
    return p

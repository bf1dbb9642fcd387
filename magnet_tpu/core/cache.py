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

_DEFAULT = "/tmp/magnet_tpu_jaxcache"


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
    return p

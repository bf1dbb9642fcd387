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
    already present). Returns the number of entries copied.
    MAGNET_TPU_CACHE_SEED=0 disables (scripts/refresh_cache_seed.py
    sets it so the regenerated seed contains ONLY the current
    program's entries and the measured wall-clock is a true cold
    start)."""
    if os.environ.get("MAGNET_TPU_CACHE_SEED", "1") == "0":
        return 0
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


def _stabilize_mosaic_cache_keys() -> bool:
    """Strip debug locations from Mosaic (Pallas TPU) payloads before
    serialization, so compile-cache keys stop churning on unrelated
    source edits.

    Measured defect (round 5): the persistent-cache key canonicalizes
    the top-level StableHLO with strip-debuginfo, but a Pallas custom
    call's backend_config embeds the SERIALIZED KERNEL MODULE — whose
    location chains include the caller frames. Inserting one blank line
    in a script that (transitively) calls a Pallas kernel changed the
    key and forced a full ~7-10 min recompile of the flagship program.
    Locations in the payload are diagnostics only; stripping them makes
    the key a function of program semantics again. Best-effort: returns
    False (and changes nothing) on jax versions with a different
    lowering layout."""
    try:
        from typing import cast as type_cast

        from jax._src import tpu_custom_call as tcc
        from jax._src.lib.mlir import ir, passmanager as pm
    except Exception:
        return False
    if getattr(tcc, "_magnet_tpu_loc_stripped", False):
        return True
    orig = getattr(tcc, "_lower_mosaic_module_to_asm", None)
    if orig is None:
        return False

    def stripped(module, *, ir_version=None):
        try:
            with module.context:
                m = type_cast(ir.Module, module.operation.clone())
                pm.PassManager.parse(
                    "builtin.module(strip-debuginfo)").run(m.operation)
        except Exception:
            m = module
        return orig(m, ir_version=ir_version)

    tcc._lower_mosaic_module_to_asm = stripped
    tcc._magnet_tpu_loc_stripped = True
    return True


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Enable the on-disk compile cache; returns the directory or None
    when disabled. Safe on any backend and on old jax (best-effort)."""
    p = path if path is not None else os.environ.get(
        "MAGNET_TPU_CACHE_DIR", _DEFAULT)
    if not p:
        return None
    _stabilize_mosaic_cache_keys()
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

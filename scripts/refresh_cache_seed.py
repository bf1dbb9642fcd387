#!/usr/bin/env python
"""Regenerate the committed compile-cache seed (ckpts/jaxcache_seed/).

Runs `python bench.py` against a FRESH cache directory — so the resulting
entries are exactly the executables the driver's bench needs, nothing
else — then replaces the seed dir's contents with them. Run this after
any commit that changes the compiled bench program (model/ops/kernel
code, bench.py itself); a stale seed is harmless (cache miss) but wastes
the driver's cold-start budget.

Usage:  python scripts/refresh_cache_seed.py  [--keep-tmp]
Prints the cold wall-clock of the bench run (the number that must stay
under the driver budget even on a total cache miss) and the seed size.
"""

import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SEED = os.path.join(REPO, "ckpts", "jaxcache_seed")


def main():
    tmp = tempfile.mkdtemp(prefix="magnet_tpu_seedgen_")
    env = dict(os.environ)
    env["MAGNET_TPU_CACHE_DIR"] = tmp
    env["MAGNET_TPU_CACHE_SEED"] = "0"   # true cold start; no stale
    #                                      entries carried into the seed
    t0 = time.time()
    proc = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                          env=env, cwd=REPO)
    dt = time.time() - t0
    if proc.returncode != 0:
        print(f"bench.py failed rc={proc.returncode}; seed NOT updated")
        sys.exit(proc.returncode)
    entries = sorted(n for n in os.listdir(tmp) if n.endswith("-cache"))
    if not entries:
        print("bench.py wrote no cache entries; seed NOT updated")
        sys.exit(1)
    os.makedirs(SEED, exist_ok=True)
    for name in os.listdir(SEED):
        if name.endswith("-cache"):
            os.remove(os.path.join(SEED, name))
    total = 0
    for name in entries:
        src = os.path.join(tmp, name)
        total += os.path.getsize(src)
        shutil.copyfile(src, os.path.join(SEED, name))
    if "--keep-tmp" not in sys.argv:
        shutil.rmtree(tmp, ignore_errors=True)
    print(f"cold bench wall-clock: {dt:.1f} s")
    print(f"seeded {len(entries)} entries, {total / 1e6:.1f} MB -> {SEED}")


if __name__ == "__main__":
    main()

"""Orbax checkpointing.

The reference saves weights-only torch dicts at every validation point and
cannot resume optimizer/schedule state (train_DNet.py:113-115; SURVEY.md
section 5). Here the full TrainState (params, batch_stats, optimizer state,
step) is checkpointed — resume continues the LR schedule exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp


def save(ckpt_dir: str, state, step: Optional[int] = None) -> str:
    """Save a TrainState under ckpt_dir/<step>."""
    step = int(state.step) if step is None else int(step)
    path = os.path.join(os.path.abspath(ckpt_dir), f"{step:010d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore(ckpt_dir: str, target=None, step: Optional[int] = None):
    """Restore into the structure of ``target`` (a template TrainState),
    or as a raw tree when target is None. ``ckpt_dir`` may be either a
    parent directory of step checkpoints or one step directory itself."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    base = os.path.basename(ckpt_dir.rstrip("/"))
    if base.isdigit() and step is None:
        path = ckpt_dir
    else:
        if step is None:
            step = latest_step(ckpt_dir)
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
        path = os.path.join(ckpt_dir, f"{step:010d}")
    ckptr = ocp.StandardCheckpointer()
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, target)

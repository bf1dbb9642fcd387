"""Streaming (feature-cached) MaGNet inference for video serving.

The reference protocol (test_MaGNet.py:27-81) re-runs the frozen D-Net +
F-Net trunks on every frame of every window — in a video each frame is
encoded ~(V+1) times: once as the reference and V times as a neighbor of
nearby windows, even though the trunk outputs depend only on the frame
itself (MAGNET.py:133-144 computes them under no_grad). This module keeps
an LRU of per-frame encodings keyed by the loader's ``view_ids`` so
steady-state per-frame work drops to ONE trunk pass + one fusion, with
predictions numerically identical to the monolithic forward (the fused
refinement consumes exactly the same tensors; tested in
tests/test_streaming.py).

Eval-only by design: training augmentations are drawn per *sample* (joint
color aug across a window, dataloader_scannet.py:172-178), which makes a
frame's pixels sample-dependent — caching would be wrong there. The eval
pipelines apply no augmentation.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

import jax
import jax.numpy as jnp


class FrameEncodingCache:
    """LRU of per-frame trunk encodings.

    max_frames bounds HBM residency: one 480x640 encoding is ~12 MB in
    bf16 (gauss 2ch + decoder feature 256ch + matching feature 64ch at
    120x160), so the default keeps well under 1 GB.
    """

    def __init__(self, encode: Callable, max_frames: int = 48):
        self._encode = encode
        self._max = max_frames
        self._entries: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, frame_id: str, img):
        """img: (1, H, W, 3) host or device array."""
        if frame_id in self._entries:
            self._entries.move_to_end(frame_id)
            self.hits += 1
            return self._entries[frame_id]
        enc = self._encode(jnp.asarray(img))
        self.misses += 1
        self._entries[frame_id] = enc
        while len(self._entries) > self._max:
            self._entries.popitem(last=False)
        return enc

    @property
    def hit_rate(self) -> float:
        n = self.hits + self.misses
        return self.hits / n if n else 0.0


def make_streaming_forward(model, variables, cast_params, cast_img,
                           n_iters: int, max_frames: int = 48):
    """Build a ``forward(batch) -> final (1, H, W, 2)`` for
    eval/harness.evaluate_magnet that encodes each distinct frame once.

    cast_params(variables) -> apply-ready variables (compute-dtype cast);
    cast_img(x) -> compute-dtype image. Requires batch size 1 (the
    reference eval protocol) and ``batch['view_ids']`` from the loader.
    Returns (forward, cache) — cache exposes hit/miss counters.
    """
    # The cast runs once, on device; cvars then rides along as a jit
    # ARGUMENT (closure-captured weights would be embedded into the
    # lowered program as constants — see test_DNet.py).
    cvars = cast_params(variables)

    @jax.jit
    def encode(cvars, img):
        return model.apply(cvars, cast_img(img), train=False,
                           method="encode")

    @jax.jit
    def fuse(cvars, ref_gauss, x_d3, ref_feat, src_gauss, src_feat,
             R, t, is_valid, intM, rays2d):
        preds = model.apply(cvars, ref_gauss, x_d3, ref_feat, src_gauss,
                            src_feat, R, t, is_valid, intM, rays2d,
                            train=False, n_iters=n_iters, method="fuse")
        return preds[-1]

    cache = FrameEncodingCache(lambda img: encode(cvars, img),
                               max_frames=max_frames)

    def forward(batch):
        ids = batch["view_ids"][0]          # batch 1: [ref, src0, ...]
        ref_img = jnp.asarray(batch["ref_img"])
        src_imgs = jnp.asarray(batch["src_imgs"])
        if src_imgs.shape[0] != 1:
            raise ValueError("streaming eval requires batch size 1")
        V = src_imgs.shape[1]
        if len(ids) != V + 1:
            raise ValueError(f"view_ids has {len(ids)} entries for "
                             f"{V} source views")
        ref_gauss, ref_fd, ref_fm = cache.get(ids[0], ref_img)
        src = [cache.get(ids[1 + i], src_imgs[:, i]) for i in range(V)]
        src_gauss = jnp.stack([e[0][0] for e in src])[None]
        src_feat = jnp.stack([e[2][0] for e in src])[None]
        return fuse(cvars, ref_gauss, ref_fd, ref_fm, src_gauss,
                    src_feat,
                    jnp.asarray(batch["R"]), jnp.asarray(batch["t"]),
                    jnp.asarray(batch["is_valid"]),
                    jnp.asarray(batch["intM"]),
                    jnp.asarray(batch["rays2d"]))

    return forward, cache

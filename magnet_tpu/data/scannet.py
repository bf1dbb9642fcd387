"""ScanNet datasets.

Multi-view (dataloader_scannet.py): train/rob_test/long_test splits; local
window of V source views with existence-fallback indexing; jpg color
bilinearly resized to (input_W, input_H); reference-frame depth png / 1000;
pose txt inverted cam2world -> world2cam; per-scene raw W/H from
scannet_raw_WH.json rescales intrinsics to dpv resolution and builds the
unit-ray array; joint color augmentation (one draw for all frames).

Single-view (dataloader_scannet_D.py): per-frame img+depth with train augs
rotate +-2.5deg, hflip, random crop (crop_H x crop_W), color.

Relative poses + validity masks are precomputed here on the host
(vectorized; utils/utils.py:72-98 equivalent) so device code sees only
dense arrays.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

from magnet_tpu.data import base
from magnet_tpu.geometry import poses as poses_lib
from magnet_tpu.geometry import rays as rays_lib

_SPLITS = {"train": ("scannet_train.txt", "scans"),
           "rob_test": ("scannet_rob_test.txt", "scans_test"),
           "long_test": ("scannet_long_test.txt", "scans_test")}


def _split_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "data_split")


def load_split(fname: str):
    with open(os.path.join(_split_dir(), fname)) as f:
        return [ln.split() for ln in f.read().strip().splitlines() if ln]


class ScanNetMultiView:
    def __init__(self, args, mode: str):
        split, self.scans = _SPLITS[mode]
        self.entries = load_split(split)
        self.mode = mode
        self.args = args
        self.root = args.dataset_path
        self.img_w, self.img_h = args.input_width, args.input_height
        self.dpv_w, self.dpv_h = args.dpv_width, args.dpv_height
        self.n_views = args.MAGNET_num_source_views
        self.offsets, self.interval = base.window_indices(
            self.n_views, args.MAGNET_window_radius)
        self.center = self.n_views // 2
        with open(os.path.join(_split_dir(), "scannet_raw_WH.json")) as f:
            self.raw_wh = json.load(f)
        self.color_aug = ("train" in mode and
                         getattr(args, "data_augmentation_color", True))

    def __len__(self):
        return len(self.entries)

    def get(self, idx: int, rng: np.random.RandomState) -> Dict:
        scene, img_idx = self.entries[idx][0], int(self.entries[idx][1])
        scene_dir = os.path.join(self.root, self.scans, scene)

        def exists(i):
            return os.path.exists(
                os.path.join(scene_dir, "color", f"{i}.jpg"))

        idx_list = [base.fallback_index(img_idx, off, self.interval, exists)
                    for off in self.offsets]

        raw_w, raw_h = self.raw_wh[scene]
        K_raw = base.read_matrix_txt(
            os.path.join(scene_dir, "intrinsic", "intrinsic_color.txt"))
        intM, rays2d = rays_lib.intrinsics_for_dpv(
            K_raw, raw_w, raw_h, self.dpv_w, self.dpv_h)

        aug = base.draw_color_aug(rng, (0.75, 1.25)) if self.color_aug \
            else None

        imgs, extMs = [], []
        depth = None
        for i, ci in enumerate(idx_list):
            img = base.load_image(
                os.path.join(scene_dir, "color", f"{ci}.jpg"),
                size=(self.img_w, self.img_h))
            if aug is not None:
                img = base.color_augment(img, *aug)
            imgs.append(base.normalize_image(img))
            extMs.append(base.read_matrix_txt(
                os.path.join(scene_dir, "pose", f"{ci}.txt"), invert=True))
            if i == self.center:
                depth = base.load_depth_png(
                    os.path.join(scene_dir, "depth", f"{ci}.png"),
                    scale=1000.0, size=(self.img_w, self.img_h))

        return _pack_multiview(imgs, extMs, depth, self.center, intM,
                               rays2d, scene, str(img_idx),
                               frame_ids=[str(ci) for ci in idx_list])


def _pack_multiview(imgs, extMs, depth, center, intM, rays2d, scene,
                    img_idx, frame_ids=None) -> Dict:
    """Split ref/src, compute relative poses + validity.

    frame_ids: optional per-frame tokens aligned with ``imgs``; emitted as
    ``view_ids`` = ["scene/ref", "scene/src0", ...] so the streaming eval
    path (eval/streaming.py) can cache per-frame trunk encodings across
    overlapping windows. Identical frames must get identical ids; frames
    unique to one sample may use any unique token.
    """
    ref_ext = np.asarray(extMs[center])[None]
    src_ext = np.asarray([extMs[i] for i in range(len(extMs))
                          if i != center])[None]
    rel, valid = poses_lib.relative_poses(ref_ext, src_ext)
    R, t = poses_lib.split_rt(rel)
    src_imgs = np.stack([imgs[i] for i in range(len(imgs)) if i != center])
    out = {
        "ref_img": imgs[center].astype(np.float32),
        "src_imgs": src_imgs.astype(np.float32),
        "depth": depth.astype(np.float32),
        "R": R[0], "t": t[0], "is_valid": valid[0],
        "intM": intM.astype(np.float32),
        "rays2d": rays2d.astype(np.float32),
        "scene_name": scene, "img_idx": img_idx,
    }
    if frame_ids is not None:
        out["view_ids"] = ([f"{scene}/{frame_ids[center]}"] +
                           [f"{scene}/{frame_ids[i]}"
                            for i in range(len(frame_ids)) if i != center])
    return out


class ScanNetSingleView:
    def __init__(self, args, mode: str):
        split, self.scans = _SPLITS[mode]
        self.entries = load_split(split)
        self.mode = mode
        self.args = args
        self.root = args.dataset_path
        self.img_w, self.img_h = args.input_width, args.input_height
        self.crop_h = getattr(args, "crop_height", 416)
        self.crop_w = getattr(args, "crop_width", 544)
        self.rotate_deg = 2.5

    def __len__(self):
        return len(self.entries)

    def get(self, idx: int, rng: np.random.RandomState) -> Dict:
        scene, img_idx = self.entries[idx][0], int(self.entries[idx][1])
        scene_dir = os.path.join(self.root, self.scans, scene)
        img = base.load_image(
            os.path.join(scene_dir, "color", f"{img_idx}.jpg"),
            size=(self.img_w, self.img_h))
        depth = base.load_depth_png(
            os.path.join(scene_dir, "depth", f"{img_idx}.png"),
            scale=1000.0, size=(self.img_w, self.img_h))

        a = self.args
        if self.mode == "train":
            img, depth = _train_augs(rng, a, img, depth, self.rotate_deg,
                                     self.crop_h, self.crop_w,
                                     brightness_range=(0.75, 1.25))
        return {"img": base.normalize_image(img).astype(np.float32),
                "depth": depth.astype(np.float32),
                "scene_name": scene, "img_idx": str(img_idx)}


def _train_augs(rng, args, img, depth, rotate_deg, crop_h, crop_w,
                brightness_range):
    """Single-view train augmentations in the reference order: rotate,
    flip, crop, color (dataloader_scannet_D.py:84-110). Depth is scaled
    BEFORE rotation in the reference only for kitti; here depth is already
    metric, and nearest-rotate commutes with scaling."""
    if getattr(args, "data_augmentation_rotate", True):
        angle = (rng.rand() - 0.5) * 2 * rotate_deg
        img, depth = base.rotate_pair(img, depth, angle)
    if getattr(args, "data_augmentation_flip", True) and rng.rand() > 0.5:
        img = img[:, ::-1].copy()
        depth = depth[:, ::-1].copy()
    if getattr(args, "data_augmentation_crop", True):
        img, depth = base.random_crop_pair(rng, img, depth, crop_h, crop_w)
    if getattr(args, "data_augmentation_color", True):
        aug = base.draw_color_aug(rng, brightness_range)
        if aug is not None:
            img = base.color_augment(img, *aug)
    return img, depth


def _make_loader(dataset, args, mode: str):
    train = "train" in mode
    # Per-host epoch shard in multi-host training (the TPU-native
    # DistributedSampler: every host sees a disjoint slice of the shuffled
    # index list; reference data/dataloader_scannet.py:48-49). Single-host
    # is (0, 1) so nothing changes.
    import jax
    return base.Loader(
        dataset,
        batch_size=args.batch_size if train else 1,
        train=train, seed=getattr(args, "seed", 0),
        num_workers=getattr(args, "workers", 4) if train else 1,
        host_index=jax.process_index() if train else 0,
        host_count=jax.process_count() if train else 1)


def ScanNetMultiViewLoader(args, mode):
    return _make_loader(ScanNetMultiView(args, mode), args, mode)


def ScanNetSingleViewLoader(args, mode):
    return _make_loader(ScanNetSingleView(args, mode), args, mode)

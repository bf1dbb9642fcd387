"""End-to-end dataset tests against fabricated on-disk scenes: exercises
the full read paths (images, depth PNGs, poses/calib/oxts, intrinsics,
window fallback) for ScanNet, KITTI, and 7-Scenes."""

import argparse
import os

import numpy as np
import pytest
from PIL import Image

from magnet_tpu.data import kitti, scannet, sevenscenes


def _write_img(path, w, h, seed=0):
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(
        path)


def _write_depth(path, w, h, scale=1000, seed=1):
    rng = np.random.RandomState(seed)
    d = rng.randint(500, 5000, (h, w)).astype(np.uint16)
    Image.fromarray(d, mode="I;16").save(path)


def _write_pose(path, t):
    m = np.eye(4)
    m[:3, 3] = t
    np.savetxt(path, m)


def _mv_args(**kw):
    d = dict(input_width=64, input_height=48, dpv_width=16, dpv_height=12,
             MAGNET_num_source_views=2, MAGNET_window_radius=2,
             batch_size=1, workers=1, seed=0,
             data_augmentation_color=False)
    d.update(kw)
    return argparse.Namespace(**d)


@pytest.fixture
def scannet_scene(tmp_path, monkeypatch):
    scene = tmp_path / "scans_test" / "scene0000_00"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (scene / sub).mkdir(parents=True)
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 580, 578, 320, 240
    np.savetxt(scene / "intrinsic" / "intrinsic_color.txt", K)
    for i in range(5):
        _write_img(scene / "color" / f"{i}.jpg", 64, 48, seed=i)
        _write_depth(scene / "depth" / f"{i}.png", 64, 48, seed=i)
        _write_pose(scene / "pose" / f"{i}.txt", [0.1 * i, 0, 0])
    # patch the split list and raw-WH dict
    monkeypatch.setattr(scannet, "load_split",
                        lambda f: [["scene0000_00", "2"]])
    import json
    monkeypatch.setattr(
        scannet.ScanNetMultiView, "__init__",
        _scannet_init_factory(str(tmp_path)))
    return tmp_path


def _scannet_init_factory(root):
    orig = scannet.ScanNetMultiView.__init__

    def init(self, args, mode):
        self.entries = [["scene0000_00", "2"]]
        self.scans = "scans_test"
        self.mode = mode
        self.args = args
        self.root = root
        self.img_w, self.img_h = args.input_width, args.input_height
        self.dpv_w, self.dpv_h = args.dpv_width, args.dpv_height
        self.n_views = args.MAGNET_num_source_views
        from magnet_tpu.data import base
        self.offsets, self.interval = base.window_indices(
            self.n_views, args.MAGNET_window_radius)
        self.center = self.n_views // 2
        self.raw_wh = {"scene0000_00": [1296, 968]}
        self.color_aug = False
    return init


def test_scannet_multiview_ondisk(scannet_scene):
    ds = scannet.ScanNetMultiView(_mv_args(), "long_test")
    item = ds.get(0, np.random.RandomState(0))
    assert item["ref_img"].shape == (48, 64, 3)
    assert item["src_imgs"].shape == (2, 48, 64, 3)
    assert item["depth"].shape == (48, 64)
    assert np.all(item["depth"] >= 0) and item["depth"].max() <= 5.1
    assert np.all(item["is_valid"] == 1)
    # window radius 2, V=2 -> source offsets +-2 frames; cam2world poses
    # translate 0.1/frame, so the relative translation is 0.2
    assert item["R"].shape == (2, 3, 3)
    np.testing.assert_allclose(item["R"][0], np.eye(3), atol=1e-6)
    assert abs(abs(item["t"][1][0]) - 0.2) < 1e-6


def test_sevenscenes_ondisk(tmp_path, monkeypatch):
    seq = tmp_path / "chess" / "seq-03"
    seq.mkdir(parents=True)
    for i in range(5):
        _write_img(seq / ("frame-%06d.color.png" % i), 64, 48, seed=i)
        rng = np.random.RandomState(i)
        d = rng.randint(500, 5000, (48, 64)).astype(np.uint16)
        d[0, 0] = 65535           # sentinel
        Image.fromarray(d, mode="I;16").save(
            seq / ("frame-%06d.depth.png" % i))
        _write_pose(seq / ("frame-%06d.pose.txt" % i), [0, 0.05 * i, 0])

    import magnet_tpu.data.sevenscenes as svs
    monkeypatch.setattr(svs, "load_split", lambda f: [["chess", "3", "2"]])
    args = _mv_args(dataset_path=str(tmp_path))
    ds = svs.SevenScenesMultiView(args, "test")
    item = ds.get(0, np.random.RandomState(0))
    assert item["ref_img"].shape == (48, 64, 3)
    assert item["depth"][0, 0] == 0.0          # sentinel zeroed
    assert np.all(item["is_valid"] == 1)


def test_kitti_multiview_ondisk(tmp_path, monkeypatch):
    date = "2011_01_01"
    drive = "0001"
    scene = f"{date}_drive_{drive}_sync"
    date_dir = tmp_path / "rawdata" / date
    img_dir = date_dir / scene / "image_02" / "data"
    oxts_dir = date_dir / scene / "oxts" / "data"
    gt_dir = tmp_path / "train" / scene / "proj_depth" / "groundtruth" / \
        "image_02"
    for d in (img_dir, oxts_dir, gt_dir):
        d.mkdir(parents=True)

    W_raw, H_raw = 1242, 375
    R9 = " ".join(map(str, np.eye(3).reshape(-1)))
    (date_dir / "calib_imu_to_velo.txt").write_text(
        f"R: {R9}\nT: 0 0 0\n")
    (date_dir / "calib_velo_to_cam.txt").write_text(
        f"R: {R9}\nT: 0 0 0\n")
    P = np.array([[720.0, 0, 610, 0], [0, 720, 175, 0],
                  [0, 0, 1, 0]]).reshape(-1)
    (date_dir / "calib_cam_to_cam.txt").write_text(
        f"R_rect_00: {R9}\nP_rect_02: " + " ".join(map(str, P)) + "\n")

    for i in range(5):
        _write_img(img_dir / ("%010d.png" % i), W_raw, H_raw, seed=i)
        (oxts_dir / ("%010d.txt" % i)).write_text(
            " ".join(map(str, [49.0, 8.43 + 1e-5 * i, 110.0, 0, 0, 0]
                         + [0.0] * 24)))
        d = (np.random.RandomState(i).rand(H_raw, W_raw)
             * 60 * 256).astype(np.uint16)
        Image.fromarray(d, mode="I;16").save(gt_dir / ("%010d.png" % i))

    import magnet_tpu.data.kitti as km
    monkeypatch.setattr(km, "load_split",
                        lambda f: [[date, drive, "train", "2"]])
    km.load_calib.cache_clear()
    args = _mv_args(input_width=1216, input_height=352, dpv_width=304,
                    dpv_height=88, dataset_path=str(tmp_path),
                    MAGNET_window_radius=2)
    ds = km.KittiMultiView(args, "eigen_test")
    item = ds.get(0, np.random.RandomState(0))
    assert item["ref_img"].shape == (352, 1216, 3)
    assert item["depth"].shape == (352, 1216)
    assert np.all(item["is_valid"] == 1)
    assert item["rays2d"].shape == (3, 88 * 304)
    # forward motion along +x (mercator east) appears in the poses
    assert abs(item["t"]).max() > 0

"""Smoke tests of the training visualizations (matplotlib Agg dumps)."""

import argparse
import os

import numpy as np

from magnet_tpu.utils import visualize


def _args(tmp_path):
    return argparse.Namespace(dataset_name="scannet", min_depth=1e-3,
                              max_depth=10.0, exp_vis_dir=str(tmp_path))


def test_visualize_dnet(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    gt = rng.uniform(1, 5, (1, 16, 24)).astype(np.float32)
    pred = np.stack([gt[0] + 0.1, np.ones((16, 24))], -1)[None]
    visualize.visualize_dnet(_args(tmp_path), img, gt, pred, 42)
    names = sorted(os.listdir(tmp_path))
    assert [n.split("_", 1)[1] for n in names] == [
        "gt_dmap.jpg", "img.jpg", "pred_dmap.jpg", "pred_emap.jpg",
        "pred_stdev.jpg"]


def test_visualize_fnet(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    gt = rng.uniform(1, 5, (1, 16, 24)).astype(np.float32)
    pred = rng.uniform(1, 5, (1, 4, 6)).astype(np.float32)
    visualize.visualize_fnet(_args(tmp_path), img, gt, pred, 1)
    assert len(os.listdir(tmp_path)) == 4


def test_visualize_magnet(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.rand(1, 16, 24, 3).astype(np.float32)
    gt = rng.uniform(1, 5, (1, 16, 24)).astype(np.float32)
    preds = [np.stack([gt[0], np.ones((16, 24))], -1)[None]] * 2
    visualize.visualize_magnet(_args(tmp_path), img, gt, preds, 7)
    # img + gt + 3 per iteration
    assert len(os.listdir(tmp_path)) == 2 + 3 * 2

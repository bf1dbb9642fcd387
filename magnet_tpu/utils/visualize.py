"""Training visualization (matplotlib Agg image dumps).

Host-side equivalents of the reference's periodic dumps
(utils/utils.py:205-332): input image, GT depth, predicted depth, error
map, and stdev map (per-iteration variants for MaGNet). Depth/error color
ranges are dataset dependent (indoor 5.0/0.5, outdoor 60/3).
All inputs NHWC numpy.
"""

from __future__ import annotations

import numpy as np
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from magnet_tpu.data.base import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402


def _ranges(dataset_name: str):
    if dataset_name in ("nyu", "scannet", "7scenes", "synthetic"):
        return 5.0, 0.5
    return 60.0, 3.0


def unnormalize(img: np.ndarray) -> np.ndarray:
    out = img * IMAGENET_STD + IMAGENET_MEAN
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def _save_depth(path, dmap, d_max):
    plt.imsave(path, dmap, vmin=0.0, vmax=d_max, cmap="jet")


def _save_error(path, emap, e_max):
    plt.imsave(path, emap, vmin=0.0, vmax=e_max, cmap="Reds")


def _error_map(pred, gt, min_depth, max_depth):
    e = np.abs(pred - gt)
    e[gt < min_depth] = 0.0
    e[gt > max_depth] = 0.0
    return e


def visualize_dnet(args, img, gt_dmap, pred, total_iter):
    """img (B,H,W,3); gt (B,H,W); pred (B,H,W,2)=(mu,var)."""
    d_max, e_max = _ranges(args.dataset_name)
    img0 = np.asarray(img)[0]
    gt0 = np.asarray(gt_dmap)[0]
    mu = np.asarray(pred)[0, :, :, 0]
    stdev = np.sqrt(np.asarray(pred)[0, :, :, 1])
    pre = f"{args.exp_vis_dir}/{total_iter:08d}"
    plt.imsave(f"{pre}_img.jpg", unnormalize(img0))
    _save_depth(f"{pre}_gt_dmap.jpg", gt0, d_max)
    _save_depth(f"{pre}_pred_dmap.jpg", mu, d_max)
    _save_error(f"{pre}_pred_emap.jpg",
                _error_map(mu, gt0, args.min_depth, args.max_depth), e_max)
    _save_error(f"{pre}_pred_stdev.jpg", stdev, e_max)


def visualize_fnet(args, img, gt_dmap, pred_dmap, total_iter):
    """pred_dmap at dpv resolution (B,h,w); nearest-upsampled for dump
    (utils/utils.py:266)."""
    d_max, e_max = _ranges(args.dataset_name)
    img0 = np.asarray(img)[0]
    gt0 = np.asarray(gt_dmap)[0]
    p = np.asarray(pred_dmap)[0]
    H, W = img0.shape[:2]
    ry, rx = H // p.shape[0], W // p.shape[1]
    p_up = np.repeat(np.repeat(p, ry, 0), rx, 1)
    pre = f"{args.exp_vis_dir}/{total_iter:08d}"
    plt.imsave(f"{pre}_img.jpg", unnormalize(img0))
    _save_depth(f"{pre}_gt_dmap.jpg", gt0, d_max)
    _save_depth(f"{pre}_pred_dmap.jpg", p_up, d_max)
    _save_error(f"{pre}_pred_emap.jpg",
                _error_map(p_up, gt0, args.min_depth, args.max_depth),
                e_max)


def visualize_magnet(args, img, gt_dmap, pred_list, total_iter):
    """pred_list: list of (B,H,W,2)=(mu,sigma) per iteration."""
    d_max, e_max = _ranges(args.dataset_name)
    img0 = np.asarray(img)[0]
    gt0 = np.asarray(gt_dmap)[0]
    pre = f"{args.exp_vis_dir}/{total_iter:08d}"
    plt.imsave(f"{pre}_img.jpg", unnormalize(img0))
    _save_depth(f"{pre}_gt_dmap.jpg", gt0, d_max)
    for i, pred in enumerate(pred_list):
        mu = np.asarray(pred)[0, :, :, 0]
        stdev = np.asarray(pred)[0, :, :, 1]
        _save_depth(f"{pre}_pred_dmap_iter{i:02d}.jpg", mu, d_max)
        _save_error(f"{pre}_pred_emap_iter{i:02d}.jpg",
                    _error_map(mu, gt0, args.min_depth, args.max_depth),
                    e_max)
        _save_error(f"{pre}_pred_stdev_iter{i:02d}.jpg", stdev, e_max)

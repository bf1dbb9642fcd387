"""Evaluation harness: the reference's per-image metric protocol
(test_DNet.py:22-74, test_MaGNet.py:27-81).

Per test image (batch 1): forward, D2H, valid-pixel mask (+ optional
garg/eigen crop on KITTI eigen), clamp/scrub predictions, 12 metrics into
a streaming average.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

from magnet_tpu.eval import metrics as M


def _eval_one(gt, mu, var, args):
    valid = M.eval_mask(gt, args.min_depth, args.max_depth,
                        args.dataset_name,
                        garg_crop=getattr(args, "garg_crop", False),
                        eigen_crop=getattr(args, "eigen_crop", False))
    if not valid.any():
        return None
    pred = M.clamp_pred(mu, args.min_depth, args.max_depth)
    if var is not None:
        # scrub non-finite variances so one bad pixel can't NaN the whole
        # table (the reference scrubs only the mean, test_MaGNet.py:74-77)
        var = np.nan_to_num(var, nan=1e-6, posinf=1e6, neginf=1e-6)
        var = var[valid]
    return M.compute_depth_errors(gt[valid], pred[valid], var)


def evaluate_dnet(forward: Callable, loader, args,
                  progress: bool = True) -> Dict[str, float]:
    """forward(img (1,H,W,3)) -> (1,H,W,2) = (mu, var)."""
    avg = M.RunningAverageDict()
    for i, batch in enumerate(loader):
        gt = np.asarray(batch["depth"])[0]
        out = np.asarray(forward(batch["img"]))
        m = _eval_one(gt, out[0, :, :, 0], out[0, :, :, 1], args)
        if m is not None:
            avg.update(m)
        if progress and i % 200 == 0:
            print(f"  eval {i}/{len(loader)}", flush=True)
    return avg.get_value()


def evaluate_fnet(forward: Callable, loader, args,
                  progress: bool = True) -> Dict[str, float]:
    """F-Net in-training validation (train_FNet.py:148-186): forward(batch)
    -> (1, h, w) soft-argmax depth at dpv resolution, nearest-upsampled to
    the GT resolution; GT above max_depth zeroed; no variance (the L1-
    trained sweep has no uncertainty), so the table has no NLL row."""
    avg = M.RunningAverageDict()
    for i, batch in enumerate(loader):
        gt = np.asarray(batch["depth"])[0]
        gt = np.where(gt > args.max_depth, 0.0, gt)
        pred = np.asarray(forward(batch))[0]
        H, W = gt.shape
        iy = (np.arange(H) * pred.shape[0] // H).astype(np.int64)
        ix = (np.arange(W) * pred.shape[1] // W).astype(np.int64)
        pred = pred[iy][:, ix]
        m = _eval_one(gt, pred, None, args)
        if m is not None:
            avg.update(m)
        if progress and i % 200 == 0:
            print(f"  eval {i}/{len(loader)}", flush=True)
    return avg.get_value()


def evaluate_magnet(forward: Callable, loader, args,
                    progress: bool = True) -> Dict[str, float]:
    """forward(batch) -> final (1,H,W,2) = (mu, sigma)."""
    avg = M.RunningAverageDict()
    for i, batch in enumerate(loader):
        gt = np.asarray(batch["depth"])[0]
        # GT above max is zeroed before masking (test_MaGNet.py:43)
        gt = np.where(gt > args.max_depth, 0.0, gt)
        out = np.asarray(forward(batch))
        mu = out[0, :, :, 0]
        var = np.square(out[0, :, :, 1])
        m = _eval_one(gt, mu, var, args)
        if m is not None:
            avg.update(m)
        if progress and i % 200 == 0:
            print(f"  eval {i}/{len(loader)}", flush=True)
    return avg.get_value()

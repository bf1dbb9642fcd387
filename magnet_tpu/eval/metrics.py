"""Depth-evaluation metrics, crops, and aggregation.

Reproduces the reference's 12-metric evaluation protocol exactly
(utils/utils.py:106-144): a1/a2/a3 inlier ratios (delta < 1.25^n), abs_diff,
abs_rel, sq_rel, rmse, rmse_log, log_10, irmse, silog (x100) and Gaussian NLL
with variance clamped at 1e-6. Metrics are computed per image on masked
pixels and averaged with a streaming mean across images
(utils/utils.py:147-174; batch size 1 at eval, test_MaGNet.py:36-79).

This implementation is pure numpy on host — eval masking is data dependent
(different pixel counts per image), which would force dynamic shapes under
jit; the per-image metric reduction is a trivial fraction of eval time.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

METRIC_NAMES = (
    "a1", "a2", "a3", "abs_diff", "abs_rel", "sq_rel",
    "rmse", "log_10", "irmse", "rmse_log", "silog", "nll",
)


def compute_depth_errors(gt: np.ndarray, pred: np.ndarray,
                         var: Optional[np.ndarray] = None) -> Dict[str, float]:
    """Per-image depth metrics on pre-masked 1-D arrays of valid pixels."""
    gt = np.asarray(gt, dtype=np.float64)
    pred = np.asarray(pred, dtype=np.float64)

    thresh = np.maximum(gt / pred, pred / gt)
    a1 = float((thresh < 1.25).mean())
    a2 = float((thresh < 1.25 ** 2).mean())
    a3 = float((thresh < 1.25 ** 3).mean())

    diff = gt - pred
    abs_diff = float(np.mean(np.abs(diff)))
    abs_rel = float(np.mean(np.abs(diff) / gt))
    sq_rel = float(np.mean(diff ** 2 / gt))
    rmse = float(np.sqrt(np.mean(diff ** 2)))

    log_diff = np.log(gt) - np.log(pred)
    rmse_log = float(np.sqrt(np.mean(log_diff ** 2)))
    # silog uses the *signed* log error: sqrt(E[e^2] - E[e]^2) * 100
    err = np.log(pred) - np.log(gt)
    silog = float(np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100)

    log_10 = float(np.mean(np.abs(np.log10(gt) - np.log10(pred))))
    irmse = float(np.sqrt(np.mean((1.0 / gt - 1.0 / pred) ** 2)))

    if var is not None:
        var = np.asarray(var, dtype=np.float64).copy()
        var[var < 1e-6] = 1e-6
        nll = 0.5 * (np.log(var) + np.log(2 * np.pi) + (diff ** 2 / var))
        nll = float(np.mean(nll))
    else:
        nll = 0.0

    return dict(a1=a1, a2=a2, a3=a3, abs_diff=abs_diff, abs_rel=abs_rel,
                sq_rel=sq_rel, rmse=rmse, log_10=log_10, irmse=irmse,
                rmse_log=rmse_log, silog=silog, nll=nll)


def eval_mask(gt_dmap: np.ndarray, min_depth: float, max_depth: float,
              dataset_name: str = "", garg_crop: bool = False,
              eigen_crop: bool = False) -> np.ndarray:
    """Valid-pixel mask + optional KITTI garg/eigen crop
    (test_MaGNet.py:62-71, test_DNet.py train-val variant)."""
    valid = np.logical_and(gt_dmap > min_depth, gt_dmap < max_depth)
    if garg_crop or eigen_crop:
        h, w = gt_dmap.shape
        crop = np.zeros_like(valid)
        if garg_crop:
            crop[int(0.40810811 * h):int(0.99189189 * h),
                 int(0.03594771 * w):int(0.96405229 * w)] = 1
        elif eigen_crop:
            if dataset_name == "kitti_eigen":
                crop[int(0.3324324 * h):int(0.91351351 * h),
                     int(0.0359477 * w):int(0.96405229 * w)] = 1
            else:
                crop[45:471, 41:601] = 1
        valid = np.logical_and(valid, crop)
    return valid


def clamp_pred(pred_dmap: np.ndarray, min_depth: float,
               max_depth: float) -> np.ndarray:
    """Clamp predictions into range and scrub inf/nan
    (test_MaGNet.py:74-77)."""
    pred = pred_dmap.copy()
    pred[pred < min_depth] = min_depth
    pred[pred > max_depth] = max_depth
    pred[np.isinf(pred)] = max_depth
    pred[np.isnan(pred)] = min_depth
    return pred


class RunningAverage:
    """Streaming mean (utils/utils.py:147-157)."""

    def __init__(self):
        self.avg = 0.0
        self.count = 0

    def append(self, value: float):
        self.avg = (value + self.count * self.avg) / (self.count + 1)
        self.count += 1

    def get_value(self) -> float:
        return self.avg


class RunningAverageDict:
    """Per-metric streaming mean across eval images
    (utils/utils.py:160-174)."""

    def __init__(self):
        self._dict = None

    def update(self, new_dict: Dict[str, float]):
        if self._dict is None:
            self._dict = {k: RunningAverage() for k in new_dict}
        for key, value in new_dict.items():
            self._dict[key].append(value)

    def get_value(self) -> Dict[str, float]:
        return {k: v.get_value() for k, v in self._dict.items()}


_METRIC_HEADER = "abs_rel abs_diff sq_rel rmse rmse_log irmse log_10 silog a1 a2 a3 NLL"
_METRIC_ORDER = ("abs_rel", "abs_diff", "sq_rel", "rmse", "rmse_log", "irmse",
                 "log_10", "silog", "a1", "a2", "a3", "nll")


def format_metrics(metrics: Dict[str, float]) -> str:
    return " ".join("%.4f" % metrics[k] for k in _METRIC_ORDER)


def log_metrics(txt_path: str, metrics: Dict[str, float],
                first_line: str) -> None:
    """Print + append metrics in the reference's text-log format
    (utils/utils.py:177-197)."""
    line = format_metrics(metrics)
    print(first_line)
    print(_METRIC_HEADER)
    print(line)
    with open(txt_path, "a") as f:
        f.write(first_line + "\n")
        f.write(_METRIC_HEADER + "\n")
        f.write(line + "\n\n")

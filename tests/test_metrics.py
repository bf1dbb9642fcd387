"""Tests of the evaluation metrics against direct formula computation."""

import numpy as np

from magnet_tpu.eval import metrics


def test_compute_depth_errors_formulas():
    rng = np.random.RandomState(0)
    gt = rng.uniform(0.5, 9.0, 1000)
    pred = gt * rng.uniform(0.7, 1.4, 1000)
    var = rng.uniform(1e-8, 1.0, 1000)

    m = metrics.compute_depth_errors(gt, pred, var)

    thresh = np.maximum(gt / pred, pred / gt)
    assert np.isclose(m["a1"], (thresh < 1.25).mean())
    assert np.isclose(m["a2"], (thresh < 1.25 ** 2).mean())
    assert np.isclose(m["a3"], (thresh < 1.25 ** 3).mean())
    assert np.isclose(m["abs_rel"], np.mean(np.abs(gt - pred) / gt))
    assert np.isclose(m["rmse"], np.sqrt(np.mean((gt - pred) ** 2)))
    err = np.log(pred) - np.log(gt)
    assert np.isclose(m["silog"],
                      np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100)
    v = var.copy()
    v[v < 1e-6] = 1e-6
    nll = 0.5 * (np.log(v) + np.log(2 * np.pi) + ((gt - pred) ** 2 / v))
    assert np.isclose(m["nll"], nll.mean())
    assert set(m) == set(metrics.METRIC_NAMES)


def test_nll_without_var_is_zero():
    m = metrics.compute_depth_errors(np.ones(10) * 2, np.ones(10) * 2)
    assert m["nll"] == 0.0


def test_running_average_dict():
    rad = metrics.RunningAverageDict()
    rad.update({"x": 1.0, "y": 10.0})
    rad.update({"x": 3.0, "y": 20.0})
    rad.update({"x": 5.0, "y": 30.0})
    v = rad.get_value()
    assert np.isclose(v["x"], 3.0) and np.isclose(v["y"], 20.0)


def test_eval_mask_garg_crop():
    gt = np.ones((375, 1242)) * 5.0
    mask = metrics.eval_mask(gt, 1e-3, 80.0, "kitti_eigen", garg_crop=True)
    assert mask[int(0.408108 * 375) + 1, 600]
    assert not mask[0, 0]
    assert not mask[374, 600]


def test_clamp_pred_scrubs():
    p = np.array([0.0, 5.0, np.inf, np.nan, 100.0])
    out = metrics.clamp_pred(p, 1e-3, 10.0)
    assert np.allclose(out, [1e-3, 5.0, 10.0, 1e-3, 10.0])


def test_log_metrics_format(tmp_path):
    m = {k: 0.5 for k in metrics.METRIC_NAMES}
    path = str(tmp_path / "acc.txt")
    metrics.log_metrics(path, m, "header line")
    content = open(path).read()
    assert "header line" in content
    assert "abs_rel abs_diff sq_rel rmse" in content
    assert content.count("0.5000") == 12

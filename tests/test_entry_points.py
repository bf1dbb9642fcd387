"""End-to-end smoke tests of the public entry points on the synthetic
dataset at tiny resolutions — the CLI surface (@file configs), train loop,
checkpointing, and eval harness all in one pass."""

import os
import runpy
import sys

import numpy as np
import pytest


def _write_cfg(path, lines):
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def _run(script, cfg):
    argv = sys.argv
    sys.argv = [script, cfg]
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = argv


_COMMON = ["--dataset_name synthetic", "--dataset_path /tmp/none",
           "--input_height 64", "--input_width 64",
           "--min_depth 1e-3", "--max_depth 10.0",
           "--synthetic_length 4", "--workers 1", "--log_every 1"]


def test_train_and_test_dnet_end_to_end(tmp_path):
    exp = tmp_path / "exp"
    cfg = _write_cfg(tmp_path / "dnet.txt", [
        "--exp_name t", f"--exp_dir {exp}", "--visible_gpus 0",
        "--output_dim 2", "--output_type G", "--downsample_ratio 4",
        "--DNET_architecture DenseDepth_BN",
        "--n_epochs 1", "--batch_size 2", "--validate_every 1000000",
        "--visualize_every 1000000",
        "--crop_height 64", "--crop_width 64", "--lr 1e-4",
        ] + _COMMON)
    _run("train_DNet.py", cfg)

    model_dir = exp / "t" / "models"
    ckpts = sorted(os.listdir(model_dir))
    assert ckpts, "no checkpoint written"
    assert (exp / "t" / "log" / "eval_acc.txt").exists()

    cfg2 = _write_cfg(tmp_path / "dnet_test.txt", [
        "--exp_name t2", f"--exp_dir {exp}", "--visible_gpus 0",
        "--output_dim 2", "--output_type G", "--downsample_ratio 4",
        "--DNET_architecture DenseDepth_BN",
        f"--ckpt_path {model_dir / ckpts[-1]}",
        ] + _COMMON)
    _run("test_DNet.py", cfg2)
    acc = (exp / "t2" / "log" / "test_acc.txt").read_text()
    assert "abs_rel" in acc


def test_train_fnet_end_to_end(tmp_path):
    exp = tmp_path / "exp"
    cfg = _write_cfg(tmp_path / "fnet.txt", [
        "--exp_name f", f"--exp_dir {exp}", "--visible_gpus 0",
        "--FNET_feature_dim 16", "--FNET_num_depth_bins 8",
        "--MAGNET_window_radius 4", "--MAGNET_num_source_views 2",
        "--n_epochs 1", "--batch_size 2", "--validate_every 1000000",
        "--visualize_every 1000000", "--lr 1e-4",
        "--dpv_height 16", "--dpv_width 16",
        ] + _COMMON)
    _run("train_FNet.py", cfg)
    assert sorted(os.listdir(exp / "f" / "models"))
    # in-training validation writes the 12-metric table
    # (reference train_FNet.py:126-139,148-186)
    acc = (exp / "f" / "log" / "eval_acc.txt").read_text()
    assert "abs_rel" in acc and "total_iter" in acc


def test_magnet_stage_chain(tmp_path):
    """Stage 3 composition: D-Net + F-Net orbax checkpoints feed
    train_MaGNet, whose checkpoint feeds test_MaGNet (the reference's
    staged pipeline, MAGNET.py:78-92 + test_MaGNet.py:166-169)."""
    exp = tmp_path / "exp"
    mv = ["--MAGNET_window_radius 4", "--MAGNET_num_source_views 2",
          "--dpv_height 16", "--dpv_width 16"]

    cfg_d = _write_cfg(tmp_path / "d.txt", [
        "--exp_name d", f"--exp_dir {exp}", "--visible_gpus 0",
        "--output_dim 2", "--output_type G", "--downsample_ratio 4",
        "--DNET_architecture DenseDepth_BN",
        "--n_epochs 1", "--batch_size 2", "--validate_every 1000000",
        "--visualize_every 1000000", "--crop_height 64",
        "--crop_width 64", "--lr 1e-4"] + _COMMON)
    _run("train_DNet.py", cfg_d)
    d_ckpt = sorted((exp / "d" / "models").iterdir())[-1]

    cfg_f = _write_cfg(tmp_path / "f.txt", [
        "--exp_name f", f"--exp_dir {exp}", "--visible_gpus 0",
        "--FNET_feature_dim 64", "--FNET_num_depth_bins 8",
        "--n_epochs 1", "--batch_size 2", "--validate_every 1000000",
        "--visualize_every 1000000", "--lr 1e-4"] + mv + _COMMON)
    _run("train_FNet.py", cfg_f)
    f_ckpt = sorted((exp / "f" / "models").iterdir())[-1]

    cfg_m = _write_cfg(tmp_path / "m.txt", [
        "--exp_name m", f"--exp_dir {exp}", "--visible_gpus 0",
        f"--DNET_ckpt {d_ckpt}", f"--FNET_ckpt {f_ckpt}",
        "--MAGNET_num_train_iter 2", "--MAGNET_num_test_iter 1",
        "--n_epochs 1", "--batch_size 2", "--validate_every 1000000",
        "--visualize_every 4", "--lr 1e-4"] + mv + _COMMON)
    _run("train_MaGNet.py", cfg_m)
    m_ckpt = sorted((exp / "m" / "models").iterdir())[-1]

    # Per-iteration visualization parity: the reference dumps
    # pred/error/stdev for EVERY train refinement iteration
    # (utils/utils.py:305-332) — with num_train_iter=2 both iter00 and
    # iter01 images must exist.
    vis = sorted(p.name for p in (exp / "m" / "vis").iterdir())
    for suffix in ("pred_dmap_iter00.jpg", "pred_dmap_iter01.jpg",
                   "pred_emap_iter01.jpg", "pred_stdev_iter01.jpg"):
        assert any(n.endswith(suffix) for n in vis), (suffix, vis)

    cfg_t = _write_cfg(tmp_path / "t.txt", [
        "--exp_name t", f"--exp_dir {exp}", "--visible_gpus 0",
        f"--DNET_ckpt {d_ckpt}", f"--FNET_ckpt {f_ckpt}",
        f"--MAGNET_ckpt {m_ckpt}",
        "--MAGNET_num_test_iter 1"] + mv + _COMMON)
    _run("test_MaGNet.py", cfg_t)
    acc = (exp / "t" / "log" / "test_acc.txt").read_text()
    assert "abs_rel" in acc

    # Streaming eval (--cache_features) through the same CLI must produce
    # the same metric table (synthetic view_ids are unique per sample, so
    # the cache exercises the encode/fuse split without hits).
    cfg_s = _write_cfg(tmp_path / "s.txt", [
        "--exp_name s", f"--exp_dir {exp}", "--visible_gpus 0",
        f"--DNET_ckpt {d_ckpt}", f"--FNET_ckpt {f_ckpt}",
        f"--MAGNET_ckpt {m_ckpt}", "--cache_features",
        "--MAGNET_num_test_iter 1"] + mv + _COMMON)
    _run("test_MaGNet.py", cfg_s)
    acc_s = (exp / "s" / "log" / "test_acc.txt").read_text()

    def _row(txt):
        lines = [ln for ln in txt.strip().splitlines()]
        return np.asarray([float(v) for v in lines[-1].split()])

    np.testing.assert_allclose(_row(acc_s), _row(acc), rtol=2e-3, atol=5e-3,
                               err_msg="streaming eval diverged from the "
                                       "monolithic protocol")

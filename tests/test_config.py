"""Tests: the reference's flag files parse verbatim through our parsers."""

import glob
import os

import pytest

from magnet_tpu.core import config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse(parser, cfg_path):
    return config.parse_args(parser, [cfg_path])


@pytest.mark.parametrize("cfg", sorted(
    glob.glob(os.path.join(REPO, "test_scripts", "magnet", "*.txt"))))
def test_magnet_test_configs_parse(cfg):
    args = _parse(config.build_test_magnet_parser(), cfg)
    assert args.MAGNET_num_samples == 5
    assert args.MAGNET_mvs_weighting.startswith("CW")
    assert args.DNET_ckpt and args.FNET_ckpt and args.MAGNET_ckpt
    assert args.dpv_height in (88, 120) and args.dpv_width in (160, 304)


@pytest.mark.parametrize("cfg", sorted(
    glob.glob(os.path.join(REPO, "test_scripts", "dnet", "*.txt"))))
def test_dnet_test_configs_parse(cfg):
    args = _parse(config.build_test_dnet_parser(), cfg)
    assert args.output_type == "G" and args.output_dim == 2
    assert args.DNET_architecture == "DenseDepth_BN"
    assert args.ckpt_path


@pytest.mark.parametrize("cfg", sorted(
    glob.glob(os.path.join(REPO, "train_scripts", "dnet", "*.txt"))))
def test_dnet_train_configs_parse(cfg):
    args = _parse(config.build_train_dnet_parser(), cfg)
    assert args.n_epochs in (5, 10)
    assert args.batch_size > 0


@pytest.mark.parametrize("cfg", sorted(
    glob.glob(os.path.join(REPO, "train_scripts", "fnet", "*.txt"))))
def test_fnet_train_configs_parse(cfg):
    args = _parse(config.build_train_fnet_parser(), cfg)
    assert args.FNET_feature_dim == 64


@pytest.mark.parametrize("cfg", sorted(
    glob.glob(os.path.join(REPO, "train_scripts", "magnet", "*.txt"))))
def test_magnet_train_configs_parse(cfg):
    args = _parse(config.build_train_magnet_parser(), cfg)
    assert args.loss_gamma == 0.8
    assert args.MAGNET_num_train_iter == 3


def test_kitti_config_geometry():
    args = _parse(config.build_test_magnet_parser(),
                  os.path.join(REPO, "test_scripts", "magnet",
                               "kitti_eigen.txt"))
    assert (args.input_height, args.input_width) == (352, 1216)
    assert (args.dpv_height, args.dpv_width) == (88, 304)
    assert args.garg_crop


def test_exp_dir_layout(tmp_path):
    import argparse
    args = argparse.Namespace(exp_dir=str(tmp_path), exp_name="x")
    args = config.setup_exp_dirs(args, kind="train")
    for d in (args.exp_model_dir, args.exp_vis_dir, args.exp_log_dir,
              args.exp_test_dir):
        assert os.path.isdir(d)
    config.save_args(args, os.path.join(args.exp_log_dir, "params.txt"))
    assert "exp_name: x" in open(
        os.path.join(args.exp_log_dir, "params.txt")).read()

"""Configuration system.

The public configuration surface of the reference framework is a set of
argparse flags readable from ``@file`` flag files (whitespace-separated
tokens, one or more per line). We keep that exact surface so the reference's
17 ``train_scripts/*.txt`` / ``test_scripts/*.txt`` configs work verbatim
(reference: utils/utils.py:18-22, train_DNet.py:215-279, test_MaGNet.py:86-147).

Flags are declared once in grouped tables and assembled per entry point.
TPU-specific additions (mesh shape, dtype policy, ...) are added under a
separate group and default to sensible values so reference configs need no
edits.
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence


def convert_arg_line_to_args(arg_line: str):
    """Split an @file line into individual tokens (whitespace tolerant).

    Mirrors the reference's custom tokenizer (utils/utils.py:18-22) so flag
    files with `--flag value` on one line parse identically.
    """
    for arg in arg_line.split():
        if arg.strip():
            yield str(arg)


def _new_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        fromfile_prefix_chars="@", conflict_handler="resolve"
    )
    parser.convert_arg_line_to_args = convert_arg_line_to_args
    return parser


# ---------------------------------------------------------------------------
# Flag groups
# ---------------------------------------------------------------------------

def _add_dir_flags(p):
    p.add_argument("--exp_name", required=True, type=str)
    p.add_argument("--exp_dir", required=True, type=str)
    # Accepted for config-file compatibility; TPU runtime ignores GPU visibility.
    p.add_argument("--visible_gpus", required=False, default="0", type=str)


def _add_output_flags(p, required: bool):
    p.add_argument("--output_dim", required=required, default=2, type=int,
                   help="{1, 2}")
    p.add_argument("--output_type", required=required, default="G", type=str,
                   help="{R, G}")
    p.add_argument("--downsample_ratio", type=int, default=4)


def _add_dnet_flags(p, required_arch: bool, with_ckpt: bool):
    p.add_argument("--DNET_architecture", required=required_arch,
                   type=str, default="DenseDepth_BN",
                   help="{DenseDepth_BN, DenseDepth_GN}")
    p.add_argument("--DNET_fix_encoder_weights", type=str, default="None",
                   help="None or AdaBins_fix")
    p.add_argument("--encoder_ckpt", type=str, default="",
                   help="bare torch.hub tf_efficientnet_b5_ap ImageNet "
                        "state dict (.pt) to initialize the D-Net encoder "
                        "from — replaces the reference's pretrained=True "
                        "torch.hub construction (D_dense_depth.py:10-11); "
                        "encoder stays trainable at lr/10")
    if with_ckpt:
        p.add_argument("--DNET_ckpt", required=True, type=str)


def _add_fnet_flags(p, with_ckpt: bool):
    p.add_argument("--FNET_architecture", type=str, default="PSM-Net")
    p.add_argument("--FNET_feature_dim", type=int, default=64)
    if with_ckpt:
        p.add_argument("--FNET_ckpt", required=True, type=str)


def _add_magnet_flags(p, window_radius_default: int = 10):
    p.add_argument("--MAGNET_sampling_range", type=int, default=3)
    p.add_argument("--MAGNET_num_samples", type=int, default=5)
    p.add_argument("--MAGNET_mvs_weighting", type=str, default="CW5")
    p.add_argument("--MAGNET_num_train_iter", type=int, default=3)
    p.add_argument("--MAGNET_num_test_iter", type=int, default=3)
    p.add_argument("--MAGNET_window_radius", type=int,
                   default=window_radius_default)
    p.add_argument("--MAGNET_num_source_views", type=int, default=4)


def _add_loss_flags(p, default_loss: str, with_gamma: bool):
    p.add_argument("--loss_fn", default=default_loss, type=str)
    if with_gamma:
        p.add_argument("--loss_gamma", default=0.8, type=float)


def _add_train_flags(p, default_batch: int):
    p.add_argument("--n_epochs", default=5, type=int)
    p.add_argument("--batch_size", default=default_batch, type=int)
    p.add_argument("--validate_every", default=5000, type=int)
    p.add_argument("--visualize_every", default=1000, type=int)
    # Reference-config compatible (train_scripts pass bare --distributed,
    # reference: train_DNet.py:206-210): on = SPMD data parallelism over
    # the device mesh (the default), --no_distributed = force a
    # single-device mesh (the reference's single-process path).
    p.add_argument("--distributed", default=True, action="store_true",
                   help="shard the batch over all devices (default)")
    p.add_argument("--no_distributed", dest="distributed",
                   action="store_false",
                   help="run on a single device (1-device mesh)")
    p.add_argument("--workers", default=4, type=int)
    # TPU-only extension (not in the reference): rematerialize encoder /
    # residual blocks during backward to trade compute for activation
    # memory (jax.checkpoint) — larger per-chip batches.
    p.add_argument("--remat", default=False, action="store_true",
                   help="checkpoint backbone blocks to save memory")


def _add_optimizer_flags(p, with_same_lr: bool):
    p.add_argument("--weight_decay", default=0.01, type=float)
    p.add_argument("--lr", default=0.000357, type=float)
    p.add_argument("--grad_clip", default=1.0, type=float)
    if with_same_lr:
        p.add_argument("--same_lr", default=False, action="store_true")
    p.add_argument("--div_factor", default=25, type=float)
    p.add_argument("--final_div_factor", default=10000, type=float)


def _add_dataset_flags(p, with_dpv: bool, with_crop_hw: bool):
    p.add_argument("--dataset_name", required=True, type=str)
    p.add_argument("--dataset_path", required=True, type=str)
    p.add_argument("--input_height", type=int, default=480)
    p.add_argument("--input_width", type=int, default=640)
    if with_dpv:
        p.add_argument("--dpv_height", type=int, default=120)
        p.add_argument("--dpv_width", type=int, default=160)
    if with_crop_hw:
        p.add_argument("--crop_height", type=int, default=416)
        p.add_argument("--crop_width", type=int, default=544)
    p.add_argument("--min_depth", type=float, default=1e-3)
    p.add_argument("--max_depth", type=float, default=10)


def _add_crop_flags(p):
    p.add_argument("--do_kb_crop", default=True, action="store_true")
    p.add_argument("--eigen_crop", default=False, action="store_true")
    p.add_argument("--garg_crop", default=False, action="store_true")


def _add_aug_flags(p, full: bool):
    if full:
        p.add_argument("--data_augmentation_flip", default=True,
                       action="store_true")
        p.add_argument("--data_augmentation_crop", default=True,
                       action="store_true")
    p.add_argument("--data_augmentation_color", default=True,
                   action="store_true")
    if full:
        p.add_argument("--data_augmentation_rotate", default=True,
                       action="store_true")


def _add_tpu_flags(p):
    """TPU-native additions (absent from the reference; defaults keep
    reference configs valid unchanged)."""
    p.add_argument("--mesh_shape", type=str, default="auto",
                   help="data-parallel mesh, e.g. '8' or 'auto' (all chips)")
    p.add_argument("--param_dtype", type=str, default="float32")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--use_pallas", default=True, type=lambda s: s != "False",
                   help="use Pallas kernels for the cost volume when on TPU")
    p.add_argument("--resume_ckpt", type=str, default="",
                   help="orbax checkpoint dir to resume training from "
                        "(improvement over the reference: restores optimizer "
                        "and schedule state, not just weights)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="if set, capture a device trace of a few training "
                        "steps into this directory (view with xprof)")
    p.add_argument("--cache_features", default=False, action="store_true",
                   help="streaming eval: cache per-frame D/F trunk "
                        "encodings across overlapping windows (identical "
                        "predictions, ~1 trunk pass per distinct frame; "
                        "eval-only — see eval/streaming.py)")
    p.add_argument("--cache_max_frames", type=int, default=48,
                   help="LRU capacity of the streaming feature cache")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--data_format", type=str, default="auto",
                   help="{auto, scannet, kitti, 7scenes, synthetic}")
    p.add_argument("--synthetic_length", type=int, default=64,
                   help="items per split for the synthetic dataset")
    # duplicated into test parsers too (conflict_handler='resolve' keeps
    # the train parsers' definition authoritative)
    p.add_argument("--workers", default=4, type=int)


# ---------------------------------------------------------------------------
# Entry-point parsers
# ---------------------------------------------------------------------------

def build_train_dnet_parser() -> argparse.ArgumentParser:
    """Flag surface of the reference train_DNet.py:215-272."""
    p = _new_parser()
    _add_dir_flags(p)
    _add_output_flags(p, required=True)
    _add_dnet_flags(p, required_arch=True, with_ckpt=False)
    _add_loss_flags(p, default_loss="gaussian", with_gamma=False)
    _add_train_flags(p, default_batch=16)
    _add_optimizer_flags(p, with_same_lr=True)
    _add_dataset_flags(p, with_dpv=False, with_crop_hw=True)
    _add_crop_flags(p)
    _add_aug_flags(p, full=True)
    _add_tpu_flags(p)
    return p


def build_train_fnet_parser() -> argparse.ArgumentParser:
    """Flag surface of the reference train_FNet.py:236-295."""
    p = _new_parser()
    _add_dir_flags(p)
    _add_output_flags(p, required=False)
    _add_fnet_flags(p, with_ckpt=False)
    p.add_argument("--MAGNET_window_radius", type=int, default=20)
    p.add_argument("--MAGNET_num_source_views", type=int, default=4)
    _add_loss_flags(p, default_loss="l1", with_gamma=False)
    _add_train_flags(p, default_batch=4)
    _add_optimizer_flags(p, with_same_lr=False)
    _add_dataset_flags(p, with_dpv=True, with_crop_hw=False)
    _add_crop_flags(p)
    _add_aug_flags(p, full=False)
    p.add_argument("--FNET_num_depth_bins", type=int, default=80,
                   help="number of fixed sweep planes for F-Net training")
    _add_tpu_flags(p)
    return p


def build_train_magnet_parser() -> argparse.ArgumentParser:
    """Flag surface of the reference train_MaGNet.py:222-290."""
    p = _new_parser()
    _add_dir_flags(p)
    _add_output_flags(p, required=False)
    _add_dnet_flags(p, required_arch=False, with_ckpt=True)
    _add_fnet_flags(p, with_ckpt=True)
    _add_magnet_flags(p, window_radius_default=10)
    _add_loss_flags(p, default_loss="gaussian", with_gamma=True)
    _add_train_flags(p, default_batch=4)
    _add_optimizer_flags(p, with_same_lr=False)
    _add_dataset_flags(p, with_dpv=True, with_crop_hw=False)
    _add_crop_flags(p)
    _add_aug_flags(p, full=False)
    _add_tpu_flags(p)
    return p


def build_test_dnet_parser() -> argparse.ArgumentParser:
    """Flag surface of the reference test_DNet.py:78-117."""
    p = _new_parser()
    _add_dir_flags(p)
    _add_output_flags(p, required=True)
    _add_dnet_flags(p, required_arch=True, with_ckpt=False)
    _add_dataset_flags(p, with_dpv=False, with_crop_hw=True)
    _add_crop_flags(p)
    _add_aug_flags(p, full=True)
    p.add_argument("--ckpt_path", required=True, type=str)
    _add_tpu_flags(p)
    return p


def build_test_magnet_parser() -> argparse.ArgumentParser:
    """Flag surface of the reference test_MaGNet.py:89-140."""
    p = _new_parser()
    _add_dir_flags(p)
    _add_output_flags(p, required=False)
    _add_dnet_flags(p, required_arch=False, with_ckpt=True)
    _add_fnet_flags(p, with_ckpt=True)
    _add_magnet_flags(p, window_radius_default=10)
    _add_dataset_flags(p, with_dpv=True, with_crop_hw=False)
    _add_crop_flags(p)
    _add_aug_flags(p, full=False)
    p.add_argument("--MAGNET_ckpt", default="", type=str)
    _add_tpu_flags(p)
    return p


def parse_args(parser: argparse.ArgumentParser,
               argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    """Parse CLI args; a single positional argument is treated as an @file
    (reference convention, train_DNet.py:275-279)."""
    if argv is None:
        argv = sys.argv[1:]
    argv = list(argv)
    if len(argv) == 1 and not argv[0].startswith("-"):
        argv = ["@" + argv[0]]
    return parser.parse_args(argv)


# ---------------------------------------------------------------------------
# Experiment directories & args snapshot
# ---------------------------------------------------------------------------

def setup_exp_dirs(args: argparse.Namespace, kind: str) -> argparse.Namespace:
    """Create the experiment directory layout used by the reference
    (train_DNet.py:284-295): exp/<name>/{models,test,vis,log}."""
    args.exp_dir = os.path.join(args.exp_dir, args.exp_name)
    args.exp_model_dir = os.path.join(args.exp_dir, "models")
    args.exp_test_dir = os.path.join(args.exp_dir, "test")
    args.exp_vis_dir = os.path.join(args.exp_dir, "vis")
    args.exp_log_dir = os.path.join(args.exp_dir, "log")
    dirs = [args.exp_dir, args.exp_test_dir, args.exp_log_dir]
    if kind == "train":
        dirs += [args.exp_model_dir, args.exp_vis_dir]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    args.eval_acc_txt = os.path.join(args.exp_log_dir, "eval_acc.txt")
    args.test_acc_txt = os.path.join(args.exp_log_dir, "test_acc.txt")
    return args


def save_args(args: argparse.Namespace, filename: str) -> None:
    """Dump one `key: value` per line (reference utils/utils.py:25-28)."""
    with open(filename, "w") as f:
        for arg in vars(args):
            f.write("{}: {}\n".format(arg, getattr(args, arg)))

"""Acceptance-run dry fire (docs/PARITY_RUN.md, VERDICT r4 next #7).

The released-checkpoint parity run is environmentally blocked (no
network/datasets), so this test fires the ENTIRE chain it would use with
synthetic stand-ins: reference-authored torch modules (instantiated from
/root/reference, hub satisfied offline) are saved as real ``.pt`` files
— the same key layout the released checkpoints carry, as pinned by
tests/test_reference_oracle.py's key census — then the ACTUAL CLI entry
points consume them end to end (``.pt`` suffix dispatch -> converter ->
jitted eval -> metric table on disk). A real parity run only swaps in
the downloaded files and dataset paths; every other moving part executes
here, headless, in one pytest.
"""

import os
import runpy
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted")


import contextlib


@contextlib.contextmanager
def _ref_modules():
    """Reference model classes with torch.hub satisfied offline; the hub
    patch stays active through the ``with`` body because DNET pulls the
    encoder from torch.hub at CONSTRUCTION time (D_dense_depth.py:10-11),
    not at import time."""
    import torch_ref
    sys.path.insert(0, REF)
    orig_hub = torch.hub.load
    torch.hub.load = lambda *a, **k: torch_ref.EffNetB5Hub()
    try:
        import models.MAGNET as M
        import models.DNET as D
        import models.FNET as F
        yield types.SimpleNamespace(MAGNET=M.MAGNET, DNET=D.DNET,
                                    FNET=F.FNET)
    finally:
        torch.hub.load = orig_hub
        sys.path.remove(REF)


def _args(**overrides):
    ns = types.SimpleNamespace(
        output_type="G", output_dim=2,
        DNET_architecture="DenseDepth_BN", downsample_ratio=4,
        DNET_fix_encoder_weights="nothing",
        FNET_architecture="PSM-Net", FNET_feature_dim=64,
        MAGNET_sampling_range=3, MAGNET_num_samples=5,
        MAGNET_mvs_weighting="CW5", MAGNET_num_train_iter=1,
        MAGNET_num_test_iter=1, dpv_height=16, dpv_width=16,
        DNET_ckpt=None, FNET_ckpt=None)
    for k, v in overrides.items():
        setattr(ns, k, v)
    return ns


def _run_cli(script, cfg):
    argv = sys.argv
    sys.argv = [script, cfg]
    try:
        runpy.run_path(script, run_name="__main__")
    finally:
        sys.argv = argv


def _metric_row(path):
    lines = open(path).read().strip().splitlines()
    header = lines[-2].split()
    values = [float(v) for v in lines[-1].split()]
    assert len(values) == len(header) >= 12, (header, values)
    return dict(zip(header, values))


def test_released_pt_chain_dry_fire(tmp_path):
    """Fake released .pt files (reference modules' state_dicts, seeded
    deterministically) drive test_DNet.py AND test_MaGNet.py over the
    synthetic dataset; both must produce finite 12-metric tables."""
    d_pt = str(tmp_path / "DNET_synth.pt")
    f_pt = str(tmp_path / "FNET_synth.pt")
    m_pt = str(tmp_path / "MAGNET_synth.pt")
    with _ref_modules() as ref:
        torch.manual_seed(0)
        dnet = ref.DNET(_args(), dnet=False)
        fnet = ref.FNET(_args())
        # the release wraps weights under 'model' with a 'module.' DP
        # prefix (compat/torch_loader.load_state_dict handles both);
        # MAGNET itself consumes the D/F .pt files at construction
        # (MAGNET.py:78-92), just like a real release chain.
        torch.save({"model": {"module." + k: v for k, v in
                              dnet.state_dict().items()}}, d_pt)
        torch.save({"model": {"module." + k: v for k, v in
                              fnet.state_dict().items()}}, f_pt)
        magnet = ref.MAGNET(_args(DNET_ckpt=d_pt, FNET_ckpt=f_pt))
        torch.save({"model": {"module." + k: v for k, v in
                              magnet.state_dict().items()}}, m_pt)

    exp = tmp_path / "exp"
    common = ["--dataset_name synthetic", "--dataset_path /tmp/none",
              "--input_height 64", "--input_width 64",
              "--min_depth 1e-3", "--max_depth 10.0",
              "--synthetic_length 2", "--workers 1",
              "--visible_gpus 0", f"--exp_dir {exp}"]

    cfg_d = tmp_path / "d.txt"
    cfg_d.write_text("\n".join([
        "--exp_name d", "--output_dim 2", "--output_type G",
        "--downsample_ratio 4", "--DNET_architecture DenseDepth_BN",
        f"--ckpt_path {d_pt}"] + common) + "\n")
    _run_cli("test_DNet.py", str(cfg_d))
    row_d = _metric_row(exp / "d" / "log" / "test_acc.txt")
    assert all(np.isfinite(v) for v in row_d.values()), row_d

    cfg_m = tmp_path / "m.txt"
    cfg_m.write_text("\n".join([
        "--exp_name m", f"--DNET_ckpt {d_pt}", f"--FNET_ckpt {f_pt}",
        f"--MAGNET_ckpt {m_pt}", "--MAGNET_num_test_iter 1",
        "--MAGNET_window_radius 4", "--MAGNET_num_source_views 2",
        "--dpv_height 16", "--dpv_width 16"] + common) + "\n")
    _run_cli("test_MaGNet.py", str(cfg_m))
    row_m = _metric_row(exp / "m" / "log" / "test_acc.txt")
    assert all(np.isfinite(v) for v in row_m.values()), row_m

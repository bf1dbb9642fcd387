from magnet_tpu.data import base, scannet, kitti, sevenscenes, synthetic  # noqa: F401


def make_multiview_loader(args, mode: str):
    """Dataset dispatch by name (test_MaGNet.py:174-187)."""
    name = args.dataset_name
    if name == "synthetic":
        return synthetic.SyntheticMultiViewLoader(args, mode)
    if name == "scannet":
        return scannet.ScanNetMultiViewLoader(args, mode)
    if name == "7scenes":
        return sevenscenes.SevenScenesMultiViewLoader(args, mode)
    if name in ("kitti_eigen", "kitti_official"):
        return kitti.KittiMultiViewLoader(args, mode)
    raise ValueError(f"unknown dataset {name!r}")


def make_singleview_loader(args, mode: str):
    """Dataset dispatch for the D-Net stage (train_DNet.py:28-41,
    test_DNet.py)."""
    name = args.dataset_name
    if name == "synthetic":
        return synthetic.SyntheticSingleViewLoader(args, mode)
    if name == "scannet":
        return scannet.ScanNetSingleViewLoader(args, mode)
    if name == "7scenes":
        return sevenscenes.SevenScenesSingleViewLoader(args, mode)
    if name in ("kitti_eigen", "kitti_official"):
        return kitti.KittiSingleViewLoader(args, mode)
    raise ValueError(f"unknown dataset {name!r}")

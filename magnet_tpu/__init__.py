"""MaGNet-TPU: a TPU-native (JAX/Flax/Pallas) framework for multi-view depth
estimation by fusing single-view depth probability with multi-view geometry.

This is a from-scratch, TPU-first re-design with the capabilities of the
reference PyTorch implementation of MaGNet (CVPR 2022). The compute path is
pure JAX/XLA with Pallas kernels for the hot geometry ops; parallelism is
expressed with `jax.sharding` over device meshes rather than process-level
data parallelism.

Package layout:
  core/      config (argparse @file compatible), dtype policy, mesh/sharding
  geometry/  rays, intrinsics rescaling, relative poses, plane-sweep projection
  ops/       XLA ops: bilinear resampling, convex upsampling, cost volumes
  kernels/   Pallas TPU kernels for the hot ops
  nn/        Flax modules: EfficientNet-B5, DenseDepth decoder, PSM-Net, G-Net
  models/    DNet / FNet / MaGNet model compositions
  data/      input pipelines (ScanNet, KITTI, 7-Scenes) + synthetic data
  train/     optax optimizers, jitted train steps, orbax checkpointing
  eval/      depth metrics, evaluation crops, running averages, logging
  compat/    PyTorch checkpoint -> Flax parameter conversion
"""

__version__ = "0.1.0"

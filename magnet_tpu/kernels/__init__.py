from magnet_tpu.kernels import upsample_pallas  # noqa: F401

from magnet_tpu.geometry import rays, poses  # noqa: F401

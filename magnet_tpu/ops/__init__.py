from magnet_tpu.ops import resample, upsample, costvolume  # noqa: F401

from magnet_tpu.core import config, mesh, dtypes  # noqa: F401

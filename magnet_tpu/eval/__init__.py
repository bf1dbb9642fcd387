from magnet_tpu.eval import metrics  # noqa: F401

from magnet_tpu.train import losses, optim  # noqa: F401

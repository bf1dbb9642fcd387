from magnet_tpu.compat import torch_loader  # noqa: F401

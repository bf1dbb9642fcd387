from magnet_tpu.nn import layers, efficientnet, densedepth, psmnet, gnet  # noqa: F401

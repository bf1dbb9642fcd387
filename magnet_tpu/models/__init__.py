from magnet_tpu.models import dnet, fnet, magnet  # noqa: F401

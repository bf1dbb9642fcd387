from magnet_tpu.utils import visualize  # noqa: F401


def write_to_log(txt_filename: str, msg: str) -> None:
    """Append-only text logging (utils/utils.py:31-33)."""
    with open(txt_filename, "a") as f:
        f.write(f"{msg}\n")

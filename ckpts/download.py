#!/usr/bin/env python
"""Download the released reference checkpoints (torch .pt) from Google
Drive (ckpts/download.py of the reference; same file IDs — they are
published data). The framework consumes these directly through the
compat converter (magnet_tpu/compat/torch_loader.py); no manual
conversion step is needed.

Usage: python ckpts/download.py [name ...]   (default: all)
"""

import os
import sys
import urllib.parse
import urllib.request

CKPTS = {
    "AdaBins_kitti_encoder": "1wNMVvZmaLVUflIM_yFLj9vQBD7jBmT0N",
    "DNET_kitti_eigen": "1eRQtf9MJNPXmn1UDr2RjEqbQfY4NQ7jT",
    "DNET_kitti_official": "1z_3zz-hPxSfiUKsN1TIBeZv6YRvZGtfP",
    "DNET_scannet": "1bbzfboj6XkfFhoJ54Iiqc5Ylj95A015M",
    "FNET_kitti_eigen": "1_mcielHqddp9p9ua7by77JG55h_5S9tT",
    "FNET_kitti_official": "1raQGaE5HrciulIZmNn5TNGp87AgyYp4Y",
    "FNET_scannet": "1ugDr67UOanpQZMlPopiM8OihUexhPql4",
    "MAGNET_kitti_eigen": "1MmqunqAr1mGqYUGBNUUmaJHAO7fYgiYn",
    "MAGNET_kitti_official": "1mKspc_p3yXp-zd1sZDeau9qrl82pJyGG",
    "MAGNET_scannet": "1Zuy_8P97OT9Of5PtyNc22DzhXQlD2OE-",
}


def download_gdrive(file_id: str, destination: str) -> None:
    """Fetch a (public) Google Drive file, following the large-file
    confirmation redirect."""
    url = ("https://docs.google.com/uc?export=download&id="
           + urllib.parse.quote(file_id))
    opener = urllib.request.build_opener(urllib.request.HTTPCookieProcessor())
    with opener.open(url) as resp:
        data = resp.read()
    # Large files return an HTML confirmation page instead of the payload.
    if data[:6] in (b"<!DOCT", b"<html>", b"<html "):
        import re
        m = re.search(rb'confirm=([0-9A-Za-z_-]+)', data)
        token = m.group(1).decode() if m else "t"
        url2 = (f"https://docs.google.com/uc?export=download&confirm="
                f"{token}&id={urllib.parse.quote(file_id)}")
        with opener.open(url2) as resp:
            data = resp.read()
    with open(destination, "wb") as f:
        f.write(data)


def main():
    names = sys.argv[1:] or sorted(CKPTS)
    here = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        dest = os.path.join(here, f"{name}.pt")
        if os.path.exists(dest):
            print(f"{name}: already present")
            continue
        print(f"downloading {name} ...")
        download_gdrive(CKPTS[name], dest)
        print(f"  -> {dest} ({os.path.getsize(dest)} bytes)")


if __name__ == "__main__":
    main()

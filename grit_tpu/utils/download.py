"""Checkpoint/data download helpers (reference utils/utils.py gdrive downloader).

The released GRIT checkpoints live on Google Drive (reference README.md:17-22).
``download_gdrive`` replicates the confirm-token dance without extra deps.
"""

from __future__ import annotations

import os
import urllib.request


def download_url(url: str, dst: str, chunk: int = 1 << 20) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    tmp = dst + ".part"
    with urllib.request.urlopen(url) as r, open(tmp, "wb") as f:
        while True:
            buf = r.read(chunk)
            if not buf:
                break
            f.write(buf)
    os.replace(tmp, dst)
    return dst


def download_gdrive(file_id: str, dst: str) -> str:
    """Download a Google Drive file, handling the large-file confirm token."""
    import http.cookiejar

    base = "https://docs.google.com/uc?export=download"
    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(urllib.request.HTTPCookieProcessor(jar))

    with opener.open(f"{base}&id={file_id}") as r:
        token = None
        for c in jar:
            if c.name.startswith("download_warning"):
                token = c.value
        body = r.read() if token is None else b""

    if token is not None:
        with opener.open(f"{base}&id={file_id}&confirm={token}") as r:
            body = r.read()

    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    with open(dst, "wb") as f:
        f.write(body)
    return dst

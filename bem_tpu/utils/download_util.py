"""File download helpers (reference: basicsr/utils/download_util.py).

Egress-gated: zero-egress environments raise with a clear message.
"""

from __future__ import annotations

import math
import os


def sizeof_fmt(size, suffix="B"):
    for unit in ["", "K", "M", "G", "T", "P", "E", "Z"]:
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"


def download_file_from_google_drive(file_id: str, save_path: str):
    try:
        import requests
    except ImportError as e:  # pragma: no cover
        raise ImportError("requests is needed for downloads") from e
    session = requests.Session()
    url = "https://docs.google.com/uc?export=download"
    response = session.get(url, params={"id": file_id}, stream=True)
    token = None
    for key, value in response.cookies.items():
        if key.startswith("download_warning"):
            token = value
    if token:
        response = session.get(
            url, params={"id": file_id, "confirm": token}, stream=True
        )
    _save_response(response, save_path)


def load_file_from_url(url: str, model_dir: str, progress: bool = True,
                       file_name: str = None) -> str:
    """Download a url into model_dir (torch-hub style)."""
    from urllib.parse import urlparse
    from urllib.request import urlopen

    os.makedirs(model_dir, exist_ok=True)
    filename = file_name or os.path.basename(urlparse(url).path)
    cached = os.path.join(model_dir, filename)
    if not os.path.exists(cached):
        with urlopen(url) as r, open(cached, "wb") as f:
            f.write(r.read())
    return cached


def _save_response(response, save_path, chunk_size=32768):
    with open(save_path, "wb") as f:
        for chunk in response.iter_content(chunk_size):
            if chunk:
                f.write(chunk)

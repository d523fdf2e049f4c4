"""Archive download/extraction helpers.

reference: code/dsp/data/utils_data.py:30-65 (torchvision re-exports of
check_integrity / download_and_extract_archive).  Native equivalents used
by the offline dataset tooling; the md5 check is the same contract the
loaders pin against.
"""

from __future__ import annotations

import hashlib
import os
import tarfile
import zipfile


def check_integrity(path: str, md5: str | None = None) -> bool:
    if not os.path.isfile(path):
        return False
    if md5 is None:
        return True
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest() == md5


def extract_archive(path: str, dest: str | None = None,
                    remove_finished: bool = False) -> str:
    dest = dest or os.path.dirname(path)
    os.makedirs(dest, exist_ok=True)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            t.extractall(dest, filter="data")
    else:
        raise ValueError(f"unknown archive format: {path}")
    if remove_finished:
        os.remove(path)
    return dest


def download_and_extract_archive(url: str, download_root: str,
                                 md5: str | None = None,
                                 remove_finished: bool = True) -> str:
    """Fetch + verify + extract (needs network; the loaders themselves never
    download — zero-egress environments populate data_assets/ offline)."""
    import urllib.request

    os.makedirs(download_root, exist_ok=True)
    fname = os.path.join(download_root, url.split("/")[-1])
    if not check_integrity(fname, md5):
        urllib.request.urlretrieve(url, fname)
        if md5 is not None and not check_integrity(fname, md5):
            raise ValueError(f"md5 mismatch after download: {fname}")
    return extract_archive(fname, download_root, remove_finished)

"""Cached URL opener (parity: reference utils/util_url.py:34-132).

The reference downloads detector/VGG weights by URL into an md5-named
cache. This environment has no network egress, so the cache is the
source of truth: a URL resolves to `<cache_dir>/<md5(url)>_<basename>`
if present (or to a local path directly). A missing cache entry raises
a clear error telling the user where to place the file.
"""

import glob
import hashlib
import io
import os
import re

_DEFAULT_CACHE_DIR = os.environ.get(
    "LATENTAUGMENT_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "latentaugment_tpu"),
)


def is_url(s):
    return isinstance(s, str) and re.match(r"^[a-z]+://", s) is not None


def make_cache_dir_path(*paths):
    """Join paths under the cache root (parity: ref dnnlib-style
    util_url.py:133-139; honors LATENTAUGMENT_CACHE_DIR)."""
    return os.path.join(_DEFAULT_CACHE_DIR, *paths)


def url_cache_path(url, cache_dir=None):
    cache_dir = cache_dir or _DEFAULT_CACHE_DIR
    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    basename = url.split("/")[-1].split("?")[0] or "download"
    return os.path.join(cache_dir, f"{url_md5}_{basename}")


def open_url(url, cache_dir=None, allow_download=None, verbose=True):
    """Open a URL (via local cache) or a local path as a binary file object."""
    if not is_url(url):
        return open(url, "rb")

    cache_dir = cache_dir or _DEFAULT_CACHE_DIR
    path = url_cache_path(url, cache_dir)
    if os.path.isfile(path):
        if verbose:
            print(f'Using cached file for "{url}": {path}')
        return open(path, "rb")

    # Fall back: any cached file with the right basename (hand-seeded cache).
    basename = url.split("/")[-1].split("?")[0]
    if basename:
        matches = sorted(glob.glob(os.path.join(cache_dir, f"*_{basename}")))
        if matches:
            if verbose:
                print(f'Using cached file for "{url}": {matches[0]}')
            return open(matches[0], "rb")

    if allow_download is None:
        allow_download = os.environ.get("LATENTAUGMENT_ALLOW_DOWNLOAD", "0") == "1"
    if allow_download:
        import urllib.request

        os.makedirs(cache_dir, exist_ok=True)
        if verbose:
            print(f'Downloading "{url}" ...')
        with urllib.request.urlopen(url) as resp:
            data = resp.read()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return io.BytesIO(data)

    raise FileNotFoundError(
        f'No cached copy of "{url}". This environment has no network egress; '
        f'place the file at "{path}" (or set LATENTAUGMENT_ALLOW_DOWNLOAD=1 '
        f"where egress exists)."
    )

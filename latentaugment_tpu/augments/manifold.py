"""Manifold datasets & statistics for the latent-walk losses.

Parity: reference augments/utils/util_dataset.py —
  * `LatentCodeDataset` / `ImgDataset`: zip-of-pickles readers
    (`<split>/<patient>/<slice>.pickle`), with the same shape checks.
  * `DatasetStats`: accumulator with the per-patient slice-ID schedule
    subsampling (ids 00010..00120 step N, util_dataset.py:45) and pickle
    save/load caching.
  * crop utilities `get_params/get_transform/get_center_crop/crop`
    (center crop to res/sqrt(2), then random crop to crop_size,
    util_dataset.py:284-332) — implemented as *static-shape* jnp
    slicing so they live inside jit (crop positions become traced
    dynamic-slice starts, shapes stay fixed).
"""

import os
import pickle
import random
import zipfile

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils import util_path


# ----------------------------------------------------------------------------
# Stats accumulator

class DatasetStats:
    """Accumulates manifold items (latents / images / features) host-side.

    The `schedule` keeps one slice every `step` per patient (file ids
    00010..00120), matching the reference's subsampling.
    """

    NDIM = {"latent": 3, "features": 4, "features_jit": 2, "img": 4}

    def __init__(self, manifold, capture_all=False, max_items=None, step=1):
        if manifold not in self.NDIM:
            raise NotImplementedError(f"Unrecognised manifold {manifold!r}! Add it!")
        self.manifold = manifold
        self.capture_all = capture_all
        self.max_items = max_items
        self.num_items = 0
        self.step = step
        self.all_x = []
        self.schedule = sorted(f"{i:05d}" for i in np.arange(10, 121, step))
        self.ndim = self.NDIM[manifold]

    def is_full(self):
        return self.max_items is not None and self.num_items >= self.max_items

    @staticmethod
    def _slice_id(fname):
        *_, last = util_path.split_dos_path_into_components(fname)
        return util_path.get_filename_without_extension(last)[-5:]

    def _admit(self, fname):
        if self.capture_all:
            return True
        return self._slice_id(fname) in self.schedule

    def admits(self, fname):
        """Public schedule check, so builders can skip expensive work
        (device feature extraction) for items append() would filter."""
        return self._admit(fname)

    def append(self, x, fname=None):
        """Add a [1, ...] item; returns #added, 0 if filtered, -1 if full."""
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == self.ndim
        if self.max_items is not None and self.num_items + x.shape[0] > self.max_items:
            if self.num_items >= self.max_items:
                return -1
            x = x[: self.max_items - self.num_items]
        if not self.capture_all and fname is not None and not self._admit(fname):
            return 0
        self.all_x.append(x)
        self.num_items += x.shape[0]
        return x.shape[0]

    def append_list(self, raw_list, fname=None):
        """Add a list of per-layer feature arrays for one item."""
        assert isinstance(raw_list, list) and len(raw_list) > 0
        arrs = [np.asarray(a, dtype=np.float32) for a in raw_list]
        assert arrs[0].ndim == self.ndim
        n = arrs[0].shape[0]
        if self.max_items is not None and self.num_items + n > self.max_items:
            if self.num_items >= self.max_items:
                return -1
            arrs = [a[: self.max_items - self.num_items] for a in arrs]
            n = arrs[0].shape[0]
        if not self.capture_all and fname is not None and not self._admit(fname):
            return 0
        self.all_x.append(arrs)
        self.num_items += n
        return n

    def get_all(self):
        return np.concatenate(self.all_x, axis=0)

    def get_all_jnp(self):
        return jnp.asarray(self.get_all())

    def get_all_list(self):
        return [jnp.asarray(np.concatenate([xs[i] for xs in self.all_x], axis=0))
                for i in range(len(self.all_x[0]))]

    def save(self, pkl_file):
        with open(pkl_file, "wb") as f:
            pickle.dump(self.__dict__, f, pickle.HIGHEST_PROTOCOL)

    @staticmethod
    def load(pkl_file):
        with open(pkl_file, "rb") as f:
            d = pickle.load(f)
        obj = DatasetStats(manifold=d["manifold"], capture_all=d["capture_all"],
                           max_items=d["max_items"], step=d["step"])
        obj.__dict__.update(d)
        return obj


# ----------------------------------------------------------------------------
# Zip-backed datasets

class _ZipDataset:
    def __init__(self, path, split):
        self._path = path
        self._split = split
        self._zipfile = None
        if os.path.splitext(path)[1].lower() != ".zip":
            raise IOError("Path must point to a zip")
        self._all_fnames = set(self._get_zipfile().namelist())
        self._fnames = sorted(
            f for f in self._all_fnames
            if os.path.splitext(f)[1].lower() == ".pickle" and split in f)
        if len(self._fnames) == 0:
            raise IOError("No files found in the specified path")

    def _get_zipfile(self):
        if self._zipfile is None:
            self._zipfile = zipfile.ZipFile(self._path)
        return self._zipfile

    def open_file(self, fname):
        return self._get_zipfile().open(fname, "r")

    def __len__(self):
        return len(self._fnames)


class LatentCodeDataset(_ZipDataset):
    """Inverted w+ codes, one [num_ws, w_dim] pickle per slice."""

    def __init__(self, path, split, w_dim=512, num_ws=14):
        super().__init__(path, split)
        w0, _ = self[0]
        if w_dim is not None and w0.shape[1] != w_dim:
            raise IOError("W does not match the specified latent dimension.")
        if num_ws is not None and w0.shape[0] != num_ws:
            raise IOError("W does not match the specified broadcasting.")

    def __getitem__(self, idx):
        fname = self._fnames[idx]
        with self.open_file(fname) as f:
            w = pickle.load(f)
        return np.asarray(w, dtype=np.float32), fname


class ImgDataset(_ZipDataset):
    """Multimodal images: pickle dict keyed by modality -> [M, H, W] float32."""

    def __init__(self, path, split, modalities, resolution=256):
        self._modalities = list(modalities)
        assert len(self._modalities) > 0
        super().__init__(path, split)
        img0, _ = self[0]
        if resolution is not None and img0.shape[1:] != (resolution, resolution):
            raise IOError("Image files do not match the specified resolution")
        if img0.shape[0] != len(self._modalities):
            raise IOError("Image does not match the specified number of channels.")

    def __getitem__(self, idx):
        fname = self._fnames[idx]
        with self.open_file(fname) as f:
            p = pickle.load(f)
        first = np.asarray(p[self._modalities[0]], dtype=np.float32)
        out = np.zeros((len(self._modalities),) + first.shape, dtype=np.float32)
        for i, mode in enumerate(self._modalities):
            out[i] = np.asarray(p[mode], dtype=np.float32)
        return out, fname


# ----------------------------------------------------------------------------
# Crop pipeline (static shapes — jit-safe)

def center_crop_size(load_size):
    """res -> floor(sqrt(res^2 / 2)) (the reference's res/sqrt(2) center crop)."""
    return int(np.sqrt((load_size * load_size) / 2))


def get_params(load_size, crop_size, preprocess="center_random_crop", rng=None):
    """Draw a random crop position; mirrors util_dataset.get_params.

    'center_crop' and 'original' draw no randomness (fixed (0, 0), which
    get_transform ignores for them) — the reference's get_params asserts
    them away (util_dataset.py:290) even though its CLI advertises them
    and its get_transform handles them, so the engine crashed on the
    first forward with --preprocess_aug center_crop."""
    if preprocess in ("center_crop", "original"):
        return {"crop_pos": (0, 0)}
    assert preprocess in ("center_random_crop", "random_crop")
    new = center_crop_size(load_size) if preprocess == "center_random_crop" else load_size
    hi = max(0, new - crop_size)
    r = rng if rng is not None else random
    return {"crop_pos": (r.randint(0, hi), r.randint(0, hi))}


def center_crop(x, load_size=None):
    """Static center crop of NCHW x to center_crop_size(H).

    Offset uses torchvision's convention — int(round((h - size) / 2.0)),
    Python banker's rounding — NOT floor division: at res=256 the crop is
    75 px smaller, (256-181)/2 = 37.5 rounds to top=38 while floor gives
    37, a one-pixel offset on every pix/LPIPS crop vs the reference
    (transforms.CenterCrop via util_dataset.py:301-323)."""
    h = x.shape[-2]
    size = center_crop_size(load_size or h)
    top = int(round((h - size) / 2.0))
    left = int(round((x.shape[-1] - size) / 2.0))
    return x[..., top:top + size, left:left + size]


def crop(x, pos, size):
    """Crop NCHW x at (x, y)=pos to size x size. `pos` may be traced."""
    px, py = pos
    if x.shape[-1] <= size and x.shape[-2] <= size:
        return x
    start = [0] * (x.ndim - 2) + [py, px]
    sizes = list(x.shape[:-2]) + [size, size]
    return lax.dynamic_slice(x, [jnp.asarray(s) for s in start], sizes)


def get_transform(load_size, crop_size, preprocess, params=None):
    """Compose the augmentation crop as one callable (jit-safe)."""
    def apply(x, crop_pos=None):
        if preprocess in ("center_crop", "center_random_crop"):
            x = center_crop(x, load_size)
        if preprocess in ("random_crop", "center_random_crop"):
            pos = crop_pos if crop_pos is not None else (
                params["crop_pos"] if params else (0, 0))
            x = crop(x, pos, crop_size)
        return x
    return apply


def get_center_crop(load_size):
    return lambda x: center_crop(x, load_size)

"""Metric utilities: options, feature statistics, progress, stat builders.

Parity: reference metrics/metric_utils.py. The torch.distributed
broadcast/interleave machinery (metric_utils.py:119-129) is replaced by
on-device batched feature extraction under jit; when MetricOptions.mesh
is set, detector batches are sharded over the mesh's 'data' axis (GSPMD
plays the role of the rank round-robin) and PR distance tiles shard
their rows (precision_recall.py). Host-side float64 mean/cov
accumulation is identical to the reference's.

Detectors resolve by URL basename: 'inception-2015-12-05' -> our
InceptionV3 (models/inception.py), 'vgg16' -> our VGG16 detector head
(models/vgg.py). Converted weights load from the URL cache when
present; otherwise a seeded random init keeps the metric self-consistent
(see the models' docstrings).
"""

import hashlib
import os
import pickle
import time
import uuid
import zipfile

import numpy as np

import jax
import jax.numpy as jnp

from ..utils.util_easydict import EasyDict
from ..utils import util_url


def make_cache_dir_path(*paths):
    base = os.environ.get("LATENTAUGMENT_CACHE_DIR",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "latentaugment_tpu"))
    path = os.path.join(base, *paths[:-1])
    os.makedirs(path, exist_ok=True)
    return os.path.join(path, paths[-1])


def format_time(seconds):
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    return f"{s // 3600}h {(s // 60) % 60:02d}m"


class MetricOptions:
    """Parity: metric_utils.py:25-41. `G` is a (params, cfg) pair or an
    object with generate(z) -> images; device/rank/num_gpus retained for
    API compatibility (JAX shards instead of ranking)."""

    def __init__(self, G=None, G_kwargs=None, dataset_kwargs=None,
                 dataset_kwargs_gen=None, num_gpus=1, rank=0, device=None,
                 progress=None, cache=True, mode_dict=None, mesh=None):
        assert 0 <= rank < num_gpus
        self.G = G
        self.G_kwargs = EasyDict(G_kwargs or {})
        self.dataset_kwargs = EasyDict(dataset_kwargs or {})
        self.dataset_kwargs_gen = EasyDict(dataset_kwargs_gen or {})
        self.num_gpus = num_gpus
        self.rank = rank
        self.device = device
        self.progress = progress.sub() if progress is not None else ProgressMonitor()
        self.cache = cache
        self.mode_dict = mode_dict
        self.mesh = mesh


# ----------------------------------------------------------------------------
# Detector registry

_feature_detector_cache = {}


def get_feature_detector_name(url):
    return os.path.splitext(url.split("/")[-1])[0]


class _Detector:
    """Callable batch -> [N, D] features.

    Params are jit ARGUMENTS, never closure constants: closed-over arrays
    are baked into the HLO and the remote-compile relay rejects multi-MB
    request bodies (round-1 ADVICE medium / CLAUDE.md constraint).
    Pass `mesh=` to shard the batch over a device mesh (the batch is
    edge-padded to a device multiple, features trimmed back).
    """

    def __init__(self, fn, params):
        self._fn = jax.jit(fn)
        self.params = params
        self._placed_for = None  # mesh id the params were replicated onto

    def __call__(self, x, mesh=None):
        if mesh is None:
            return self._fn(self.params, jnp.asarray(x))
        from ..parallel import mesh as pmesh

        if self._placed_for is not mesh:
            self.params = jax.device_put(self.params, pmesh.replicated(mesh))
            self._placed_for = mesh
        padded, n = pmesh.pad_to_multiple(np.asarray(x), mesh.devices.size)
        xs = jax.device_put(jnp.asarray(padded), pmesh.batch_sharding(mesh))
        return self._fn(self.params, xs)[:n]


def get_feature_detector(url, device=None, num_gpus=1, rank=0, verbose=False):
    """Return a _Detector for the given detector URL."""
    name = get_feature_detector_name(url)
    if name in _feature_detector_cache:
        return _feature_detector_cache[name]

    ckpt = None
    try:
        path = util_url.url_cache_path(url)
        if os.path.isfile(path):
            ckpt = path
    except Exception:
        pass

    if "inception" in name:
        from ..models import inception

        params = inception.get_inception(ckpt)
        det = _Detector(inception.inception_features, params)
    elif "vgg" in name:
        from ..models import vgg

        params = None
        if ckpt is not None:
            try:
                # Detector use needs the classifier head (fc6/fc7) on top
                # of the conv trunk; an LPIPS-only conversion (convs +
                # 'lin') would otherwise "load fine" and crash minutes
                # into feature extraction (round-3 review).
                params = vgg.load_params(ckpt, require=("conv1_1", "fc6",
                                                        "fc7"))
            except (OSError, pickle.UnpicklingError, ValueError,
                    KeyError) as e:
                print(f"[metrics] WARNING: cached VGG detector {ckpt} failed "
                      f"to load ({e}); falling back to seeded RANDOM weights "
                      "— metric values will be self-consistent but NOT "
                      "comparable to reference-detector numbers")
        if params is None:
            params = vgg.init_vgg_detector(jax.random.PRNGKey(0))
        det = _Detector(vgg.detector_features, params)
    else:
        raise NotImplementedError(f"Unknown detector {name}")
    _feature_detector_cache[name] = det
    return det


# ----------------------------------------------------------------------------
# Feature statistics (parity: metric_utils.py:79-155)

class FeatureStats:
    def __init__(self, capture_all=False, capture_mean_cov=False, max_items=None):
        self.capture_all = capture_all
        self.capture_mean_cov = capture_mean_cov
        self.max_items = max_items
        self.num_items = 0
        self.num_features = None
        self.all_features = None
        self.raw_mean = None
        self.raw_cov = None

    def set_num_features(self, num_features):
        if self.num_features is not None:
            assert num_features == self.num_features
        else:
            self.num_features = num_features
            self.all_features = []
            self.raw_mean = np.zeros([num_features], dtype=np.float64)
            self.raw_cov = np.zeros([num_features, num_features], dtype=np.float64)

    def is_full(self):
        return self.max_items is not None and self.num_items >= self.max_items

    def append(self, x):
        x = np.asarray(x, dtype=np.float32)
        assert x.ndim == 2
        if self.max_items is not None and self.num_items + x.shape[0] > self.max_items:
            if self.num_items >= self.max_items:
                return
            x = x[: self.max_items - self.num_items]
        self.set_num_features(x.shape[1])
        self.num_items += x.shape[0]
        if self.capture_all:
            self.all_features.append(x)
        if self.capture_mean_cov:
            x64 = x.astype(np.float64)
            self.raw_mean += x64.sum(axis=0)
            self.raw_cov += x64.T @ x64

    def get_all(self):
        assert self.capture_all
        return np.concatenate(self.all_features, axis=0)

    def get_all_jnp(self):
        return jnp.asarray(self.get_all())

    def get_mean_cov(self):
        assert self.capture_mean_cov
        mean = self.raw_mean / self.num_items
        cov = self.raw_cov / self.num_items
        cov = cov - np.outer(mean, mean)
        return mean, cov

    def save(self, pkl_file):
        with open(pkl_file, "wb") as f:
            pickle.dump(self.__dict__, f)

    @staticmethod
    def load(pkl_file):
        with open(pkl_file, "rb") as f:
            s = pickle.load(f)
        obj = FeatureStats(capture_all=s["capture_all"], max_items=s["max_items"])
        obj.__dict__.update(s)
        return obj


# ----------------------------------------------------------------------------
# Progress (parity: metric_utils.py:159-200)

class ProgressMonitor:
    def __init__(self, tag=None, num_items=None, flush_interval=1000, verbose=True,
                 progress_fn=None, pfn_lo=0, pfn_hi=1000, pfn_total=1000):
        self.tag = tag
        self.num_items = num_items
        self.verbose = verbose
        self.flush_interval = flush_interval
        self.progress_fn = progress_fn
        self.pfn_lo = pfn_lo
        self.pfn_hi = pfn_hi
        self.pfn_total = pfn_total
        self.start_time = time.time()
        self.batch_time = self.start_time
        self.batch_items = 0
        if self.progress_fn is not None:
            self.progress_fn(self.pfn_lo, self.pfn_total)

    def update(self, cur_items):
        assert self.num_items is None or cur_items <= self.num_items
        if cur_items < self.batch_items + self.flush_interval and \
                (self.num_items is None or cur_items < self.num_items):
            return
        cur_time = time.time()
        total_time = cur_time - self.start_time
        time_per_item = (cur_time - self.batch_time) / max(cur_items - self.batch_items, 1)
        if self.verbose and self.tag is not None:
            print(f"{self.tag:<19s} items {cur_items:<7d} time "
                  f"{format_time(total_time):<12s} ms/item {time_per_item * 1e3:.2f}")
        self.batch_time = cur_time
        self.batch_items = cur_items
        if self.progress_fn is not None and self.num_items is not None:
            self.progress_fn(
                self.pfn_lo + (self.pfn_hi - self.pfn_lo) * (cur_items / self.num_items),
                self.pfn_total)

    def sub(self, tag=None, num_items=None, flush_interval=1000, rel_lo=0, rel_hi=1):
        return ProgressMonitor(
            tag=tag, num_items=num_items, flush_interval=flush_interval,
            verbose=self.verbose, progress_fn=self.progress_fn,
            pfn_lo=self.pfn_lo + (self.pfn_hi - self.pfn_lo) * rel_lo,
            pfn_hi=self.pfn_lo + (self.pfn_hi - self.pfn_lo) * rel_hi,
            pfn_total=self.pfn_total)


# ----------------------------------------------------------------------------
# Feature-stat builders

def _to_detector_batch(x, mode_idx):
    """Select modality, make 3-channel, map [-1,1]-style floats to [0,255]."""
    x = jnp.asarray(x)
    if mode_idx is not None and x.shape[1] > 1:
        x = x[:, mode_idx:mode_idx + 1]
    if x.shape[1] == 1:
        x = jnp.repeat(x, 3, axis=1)
    x = jnp.clip(x * 127.5 + 128.0, 0, 255)
    return x


def _cache_lookup(opts, kind_kwargs, dataset_name, detector_url, stats_kwargs,
                  max_items=None):
    if not opts.cache:
        return None, None
    # max_items is part of the key: stats over 1k reals must not be
    # silently reused for a 50k request (round-3 review).
    args = dict(dataset_kwargs=kind_kwargs, detector_url=detector_url,
                stats_kwargs=stats_kwargs, max_items=max_items)
    md5 = hashlib.md5(repr(sorted(args.items())).encode("utf-8"))
    mode_name = opts.mode_dict["mode_name"] if opts.mode_dict else "all"
    tag = f"{dataset_name}-{mode_name}-{get_feature_detector_name(detector_url)}-{md5.hexdigest()}"
    cache_file = make_cache_dir_path("gan-metrics", tag + ".pkl")
    if os.path.isfile(cache_file):
        return FeatureStats.load(cache_file), cache_file
    return None, cache_file


def _cache_store(stats, cache_file):
    if cache_file is None:
        return
    os.makedirs(os.path.dirname(cache_file), exist_ok=True)
    temp = cache_file + "." + uuid.uuid4().hex
    stats.save(temp)
    os.replace(temp, cache_file)


def compute_feature_stats_for_dataset(opts, detector_url, detector_kwargs=None,
                                      mode_dict=None, rel_lo=0, rel_hi=1,
                                      batch_size=64, max_items=None,
                                      **stats_kwargs):
    """Features of the real dataset (parity: metric_utils.py:204-260).

    opts.dataset_kwargs must describe a zip ImgDataset: {path, split,
    modalities, resolution}. Images arrive raw [0,255]; normalized to
    the detector range on device.
    """
    from ..augments.manifold import ImgDataset

    dk = opts.dataset_kwargs
    dataset = ImgDataset(path=dk["path"], split=dk.get("split", "train"),
                         modalities=dk["modalities"],
                         resolution=dk.get("resolution"))
    dataset_name = os.path.splitext(os.path.basename(dk["path"]))[0]

    cached, cache_file = _cache_lookup(opts, dk, dataset_name, detector_url,
                                       stats_kwargs, max_items=max_items)
    if cached is not None:
        return cached

    num_items = len(dataset)
    if max_items is not None:
        num_items = min(num_items, max_items)
    stats = FeatureStats(max_items=num_items, **stats_kwargs)
    progress = opts.progress.sub(tag="dataset features", num_items=num_items,
                                 rel_lo=rel_lo, rel_hi=rel_hi)
    detector = get_feature_detector(detector_url)
    mode_idx = (mode_dict or opts.mode_dict or {}).get("mode_idx")

    batch = []
    for idx in range(num_items):
        img, _ = dataset[idx]
        batch.append(img)
        if len(batch) == batch_size or idx == num_items - 1:
            x = np.stack(batch)  # raw [0,255]
            x = jnp.asarray(x)
            if mode_idx is not None and x.shape[1] > 1:
                x = x[:, mode_idx:mode_idx + 1]
            if x.shape[1] == 1:
                x = jnp.repeat(x, 3, axis=1)
            feats = detector(x, mesh=opts.mesh)
            stats.append(np.asarray(feats))
            progress.update(stats.num_items)
            batch = []
            if stats.is_full():
                break

    _cache_store(stats, cache_file)
    return stats


def compute_feature_stats_for_aug_dataset(opts, detector_url, detector_kwargs=None,
                                          mode_dict=None, rel_lo=0, rel_hi=1,
                                          max_items=None, **stats_kwargs):
    """Features of dumped augmented batches (parity: metric_utils.py:264-328).

    Reads `<dataroot>/img_aug/*` pickles of {'A','B'} batches in [-1,1].
    """
    dkg = opts.dataset_kwargs_gen
    datadir = dkg["dataroot"]
    dataset_name = dkg.get("aug_name", os.path.basename(datadir))

    cached, cache_file = _cache_lookup(opts, dkg, dataset_name, detector_url,
                                       stats_kwargs, max_items=max_items)
    if cached is not None:
        return cached

    img_dir = os.path.join(datadir, "img_aug")
    fnames = sorted(os.path.join(img_dir, f) for f in os.listdir(img_dir)
                    if not f.startswith("."))
    if "batch_size" in dkg:
        per_file = int(dkg["batch_size"])
    elif fnames:
        # Each dump pickle holds a full batch; derive the per-file count
        # from the first one instead of defaulting to 1, which would
        # silently cap the stats at one sample per file (round-3 review).
        with open(fnames[0], "rb") as f:
            first = pickle.load(f)
        per_file = int(np.asarray(first["A"]).shape[0])
    else:
        per_file = 1
    num_items = len(fnames) * per_file
    if max_items is not None:
        num_items = min(num_items, max_items)

    stats = FeatureStats(max_items=num_items, **stats_kwargs)
    progress = opts.progress.sub(tag="dataset features", num_items=num_items,
                                 rel_lo=rel_lo, rel_hi=rel_hi)
    detector = get_feature_detector(detector_url)
    md = mode_dict or opts.mode_dict or {}
    mode_name = md.get("mode_name")

    for fname in fnames:
        with open(fname, "rb") as f:
            images = pickle.load(f)
        if mode_name == "MR_nonrigid_CT" or mode_name is None:
            x = images["A"]
        elif mode_name == "MR_MR_T2":
            x = images["B"]
        else:
            raise NotImplementedError(mode_name)
        x = _to_detector_batch(np.asarray(x), None)
        feats = detector(x, mesh=opts.mesh)
        stats.append(np.asarray(feats))
        progress.update(stats.num_items)
        if stats.is_full():
            break

    _cache_store(stats, cache_file)
    return stats


def _dataset_label_bank(opts, c_dim, max_items=10000):
    """Label matrix [N, c_dim] from the real dataset's distribution when
    opts.dataset_kwargs names a labeled SG2 training zip (use_labels);
    None falls back to uniform one-hot sampling. Parity: the reference
    feeds dataset.get_label(randint) per sample (metric_utils.py:337-344).
    """
    dk = opts.dataset_kwargs
    if not dk or not dk.get("use_labels"):
        return None
    try:
        from ..models.stylegan2.dataset import CustomImageFolderDataset

        ds = CustomImageFolderDataset(
            path=dk["path"], modalities=dk.get("modalities", []),
            split=dk.get("split", "train"), use_labels=True)
        if not ds.has_labels or ds.label_dim != c_dim:
            # Same error class as an unreadable zip: use_labels=True was an
            # explicit request, so a schema mismatch must not silently skew
            # conditional FID via the uniform fallback (round-3 review).
            raise RuntimeError(
                f"use_labels=True but dataset labels do not match G: "
                f"label_shape={ds.label_shape} vs c_dim={c_dim} "
                f"(path={dk.get('path')!r})")
        n = min(len(ds), max_items)
        return np.stack([ds.get_label(i) for i in range(n)]).astype(np.float32)
    except (OSError, KeyError, ValueError, zipfile.BadZipFile) as e:
        # use_labels=True is an explicit request: the reference always
        # draws labels from the dataset (metric_utils.py:337-344), so a
        # silent uniform fallback here would skew conditional FID without
        # the caller noticing. Fail loudly instead.
        raise RuntimeError(
            f"use_labels=True but dataset labels could not be read from "
            f"{dk.get('path')!r}: {e}") from e


def compute_feature_stats_for_generator(opts, detector_url, detector_kwargs=None,
                                        mode_dict=None, rel_lo=0, rel_hi=1,
                                        batch_size=64, batch_gen=None,
                                        **stats_kwargs):
    """Features of live generator samples (parity: metric_utils.py:332-374).

    opts.G must be (g_params, g_cfg) or expose .generate(z_key, n)."""
    from ..models.stylegan2 import networks

    if batch_gen is None:
        batch_gen = min(batch_size, 16)

    stats = FeatureStats(**stats_kwargs)
    assert stats.max_items is not None
    progress = opts.progress.sub(tag="generator features",
                                 num_items=stats.max_items,
                                 rel_lo=rel_lo, rel_hi=rel_hi)
    detector = get_feature_detector(detector_url)
    md = mode_dict or opts.mode_dict or {}
    mode_idx = md.get("mode_idx")

    g_params, g_cfg = opts.G
    psi = float(opts.G_kwargs.get("truncation_psi", 1.0))

    # g_params is a jit ARGUMENT (not a closure constant) — see _Detector.
    # Conditional generators draw labels per batch (parity: reference
    # iterate_random_labels, metric_utils.py:337-344 — labels come from
    # the REAL dataset's distribution when available; uniform one-hot
    # otherwise).
    c_dim = int(g_cfg.get("c_dim", 0) or 0)
    label_bank = None
    if c_dim > 0:
        label_bank = _dataset_label_bank(opts, c_dim)

    @jax.jit
    def gen(params, key, c=None):
        kz, kn, kc = jax.random.split(key, 3)
        z = jax.random.normal(kz, (batch_gen, g_cfg.z_dim))
        if c_dim > 0 and c is None:
            idx = jax.random.randint(kc, (batch_gen,), 0, c_dim)
            c = jax.nn.one_hot(idx, c_dim)
        img = networks.generator_apply(
            params, g_cfg, z, c, noise_mode="random", rng=kn,
            truncation_psi=psi)
        return jnp.clip(img * 127.5 + 128.0, 0, 255)

    if opts.mesh is not None:
        from ..parallel import mesh as pmesh

        g_params = jax.device_put(g_params, pmesh.replicated(opts.mesh))

    key = jax.random.PRNGKey(opts.G_kwargs.get("seed", 0))
    label_rng = np.random.RandomState(opts.G_kwargs.get("seed", 0))
    while not stats.is_full():
        key, sub = jax.random.split(key)
        c = None
        if label_bank is not None:
            c = jnp.asarray(label_bank[
                label_rng.randint(0, label_bank.shape[0], batch_gen)])
        images = gen(g_params, sub, c)
        x = images
        if mode_idx is not None and x.shape[1] > 1:
            x = x[:, mode_idx:mode_idx + 1]
        if x.shape[1] == 1:
            x = jnp.repeat(x, 3, axis=1)
        feats = detector(x, mesh=opts.mesh)
        stats.append(np.asarray(feats))
        progress.update(stats.num_items)
    return stats

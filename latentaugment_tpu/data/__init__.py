"""Data loading package: plugin dataset registry + host-side loader.

Parity: reference data/__init__.py — dynamic import of
`data/<name>_dataset.py` matching class `<Name>Dataset`, option-setter
plumbing, and a loader honoring batch_size / serial_batches /
max_dataset_size.

TPU-native difference: batches are dicts of NumPy arrays (NCHW float32)
produced on the host; device placement + sharding happen in the augment
layer (jax.device_put with a batch NamedSharding), not here.
"""

import importlib
import random

import numpy as np

from .base_dataset import BaseDataset


# The reference ships its paired-pelvis loader as pelvis_dataset.py but
# defaults --dataset_mode to 'pelvis2.1' (an unimportable module name);
# alias the advertised name to the real module.
_DATASET_ALIASES = {"pelvis2.1": "pelvis", "pelvis2_1": "pelvis"}


def find_dataset_using_name(dataset_name):
    """Import latentaugment_tpu/data/<dataset_name>_dataset.py and return the
    class whose lowercase name equals '<datasetname>dataset'."""
    dataset_name = _DATASET_ALIASES.get(dataset_name, dataset_name)
    dataset_filename = __name__ + "." + dataset_name + "_dataset"
    datasetlib = importlib.import_module(dataset_filename)

    dataset = None
    target_dataset_name = dataset_name.replace('_', '') + 'dataset'
    for name, cls in datasetlib.__dict__.items():
        if name.lower() == target_dataset_name.lower() and issubclass(cls, BaseDataset):
            dataset = cls

    if dataset is None:
        raise NotImplementedError(
            "In %s.py, there should be a subclass of BaseDataset with class "
            "name that matches %s in lowercase." % (dataset_filename, target_dataset_name))
    return dataset


def get_option_setter(dataset_name):
    """Return the static method <modify_commandline_options> of the dataset class."""
    return find_dataset_using_name(dataset_name).modify_commandline_options


def create_dataset(opt):
    """Create a dataset given the option (main interface of this package)."""
    data_loader = CustomDatasetDataLoader(opt)
    return data_loader.load_data()


def _collate(samples):
    """Stack a list of per-item dicts into a batch dict.

    ndarray values stack along a new leading batch axis; scalars become
    1-D arrays; strings (paths) become lists — matching the shape contract
    of a torch default_collate'd batch without depending on torch.
    """
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        v0 = vals[0]
        if isinstance(v0, np.ndarray):
            out[key] = np.stack(vals, axis=0)
        elif isinstance(v0, (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = list(vals)
    return out


class CustomDatasetDataLoader:
    """Wrapper class of Dataset class that performs batched host loading.

    With prefetch > 0 (default 2), a background thread pool loads and
    collates the next batches while the device is busy with the current
    one — the host-side analogue of the reference's multi-worker torch
    DataLoader, overlapping zip/pickle IO with TPU compute.
    """

    def __init__(self, opt):
        self.opt = opt
        dataset_class = find_dataset_using_name(opt.dataset_mode)
        self.dataset = dataset_class(opt)
        print("dataset [%s] was created" % type(self.dataset).__name__)
        self.batch_size = opt.batch_size
        self.shuffle = not opt.serial_batches
        self.prefetch = int(getattr(opt, "prefetch_batches", 2))
        self._rng = random.Random(getattr(opt, "seed", 42))

    def load_data(self):
        return self

    def __len__(self):
        return int(min(len(self.dataset), self.opt.max_dataset_size))

    def _batch_indices(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            self._rng.shuffle(order)
        batches = []
        emitted = 0
        batch = []
        for idx in order:
            if emitted * self.batch_size >= self.opt.max_dataset_size:
                return batches
            batch.append(idx)
            if len(batch) == self.batch_size:
                batches.append(batch)
                emitted += 1
                batch = []
        if batch and emitted * self.batch_size < self.opt.max_dataset_size:
            batches.append(batch)
        return batches

    def _load_batch(self, indices):
        return _collate([self.dataset[i] for i in indices])

    def __iter__(self):
        """Yield full batches (last partial batch dropped only if empty)."""
        batches = self._batch_indices()
        if self.prefetch <= 0 or len(batches) <= 1:
            for indices in batches:
                yield self._load_batch(indices)
            return

        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=self.prefetch) as pool:
            futures = [pool.submit(self._load_batch, b)
                       for b in batches[: self.prefetch]]
            nxt = self.prefetch
            for _ in range(len(batches)):
                batch = futures.pop(0).result()
                if nxt < len(batches):
                    futures.append(pool.submit(self._load_batch, batches[nxt]))
                    nxt += 1
                yield batch

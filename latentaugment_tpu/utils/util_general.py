"""General helpers (parity: reference utils/util_general.py — full
function surface: list/range parsers, seeding, run-dir management,
recursive copy helpers, task label maps, accumulators)."""

import collections
import os
import random
import re

import numpy as np


def parse_comma_separated_list(s):
    """'a,b,c' -> ['a', 'b', 'c'] (parity: util_general.parse_comma_separated_list)."""
    if isinstance(s, (list, tuple)):
        return list(s)
    if s is None or s == "":
        return []
    return [x.strip() for x in str(s).split(",") if x.strip() != ""]


def parse_separated_list_comma(lst):
    """['a', 'b'] -> 'a,b' (parity: util_general.parse_separated_list_comma)."""
    if isinstance(lst, str):
        return lst
    return ",".join(lst)


def list_dict():
    """defaultdict(list) accumulator (parity: util_general.list_dict)."""
    return collections.defaultdict(list)


def seed_all(seed=42):
    """Deterministic seeding of python/numpy RNGs.

    Parity: reference utils/util_general.py:195-210 (torch seeding replaced
    by the jax.random key discipline — JAX keys are explicit, not global).
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def get_next_run_id_local(run_dir_root, module):
    """Next sequential 5-digit run id under run_dir_root for a module name.

    Parity: reference utils/util_general.py run-dir management.
    """
    if not os.path.isdir(run_dir_root):
        return 0
    dir_names = []
    for d in os.listdir(run_dir_root):
        if not os.path.isdir(os.path.join(run_dir_root, d)):
            continue
        m = re.match(r"^(\d+)-" + re.escape(module), d)
        if m is None:
            m = re.match(r"^(\d+)", d)
        if m is not None:
            dir_names.append(int(m.group(1)))
    return max(dir_names) + 1 if dir_names else 0


def construct_class_by_name(*args, class_name=None, **kwargs):
    """Instantiate a class from its fully qualified name
    (parity: reference dnnlib/util.py:314-317)."""
    import importlib

    module_name, local_name = class_name.rsplit(".", 1)
    module = importlib.import_module(module_name)
    return getattr(module, local_name)(*args, **kwargs)


def format_time(seconds):
    """Seconds -> 'Xs' / 'Xm Ys' / 'Xh Ym' (parity: dnnlib.util.format_time)."""
    s = int(round(seconds))
    if s < 60:
        return f"{s}s"
    if s < 3600:
        return f"{s // 60}m {s % 60:02d}s"
    if s < 86400:
        return f"{s // 3600}h {(s // 60) % 60:02d}m"
    return f"{s // 86400}d {(s // 3600) % 24:02d}h"


def notification_ifttt(info):
    """Push-notification stub (parity: util_general.py:101-104). No egress here."""
    print(f"[notification] {info}")


def nested_dict():
    """Infinitely nesting defaultdict (parity: util_general.py:98-99)."""
    return collections.defaultdict(nested_dict)


def rgb2gray(rgb):
    """ITU-R 601 luma of an RGB array [..., 3] (parity: util_general.py:192-193)."""
    return np.asarray(rgb)[..., :3] @ np.array([0.2989, 0.5870, 0.1140])


def create_path(*path_list, f=None):
    """Join path components (parity: util_general.py:212-217)."""
    del f  # reference signature quirk: `f` is ignored/overwritten there too
    parts = [str(p) for p in path_list]
    return os.path.join(parts[0], *parts[1:]) if parts else ""


def delete_file(file_path):
    """Remove a file, tolerating absence (parity: util_general.py:219-223)."""
    try:
        os.remove(file_path)
    except FileNotFoundError:
        pass


def file_ext(fname):
    """Lower-cased extension incl. dot (parity: util_general.py:225-226)."""
    return os.path.splitext(fname)[1].lower()


def isempty(target_dir):
    """True if the directory has no entries.

    The reference's body is an unfinished `pass  # todo`
    (util_general.py:275-277); implemented properly here.
    """
    return not os.listdir(target_dir)


def maybe_min(a, b):
    """min(a, b) treating None b as +inf (parity: util_general.py:280-283)."""
    return min(a, b) if b is not None else a


def parse_range(s):
    """'1,2,5-7' -> [1, 2, 5, 6, 7] (parity: util_general.py:299-315)."""
    if isinstance(s, list):
        return s
    out = []
    for part in str(s).split(","):
        m = re.match(r"^(\d+)-(\d+)$", part)
        if m:
            out.extend(range(int(m.group(1)), int(m.group(2)) + 1))
        else:
            out.append(int(part))
    return out


def parse_vec2(s):
    """'a,b' -> (float(a), float(b)) (parity: util_general.py:318-328)."""
    if isinstance(s, tuple):
        return s
    parts = str(s).split(",")
    if len(parts) != 2:
        raise ValueError(f"cannot parse 2-vector {s}")
    return float(parts[0]), float(parts[1])


def create_run_dir_local(run_dir_root, module="run"):
    """Create the next 5-digit-id run dir (parity: util_general.py:228-245)."""
    os.makedirs(run_dir_root, exist_ok=True)
    # Name as '<id:05d>--<module>' so define_source_path can resolve runs
    # this function created (round-3 review: the reference's bare-id
    # naming is incompatible with its own '--'-keyed source resolution —
    # its id--module dirs come from an external tool).
    run_id = get_next_run_id_local(run_dir_root, module)
    run_dir = os.path.join(run_dir_root, f"{run_id:05d}--{module}")
    if os.path.exists(run_dir):
        raise RuntimeError(f"The run dir already exists! ({run_dir})")
    os.makedirs(run_dir)
    return run_dir


def define_source_path(path_dir, dataset, source_id_run=None,
                       source_run_module=None):
    """Resolve `<path_dir>/<dataset>/<id:05d>--<module>` to an existing,
    non-empty run dir (parity: util_general.py:106-131; the reference
    falls back to interactive input() — here missing/unresolvable keys
    raise instead of blocking on stdin)."""
    if source_id_run is None or source_run_module is None:
        raise ValueError("source_id_run and source_run_module are required")
    run_name = f"{int(source_id_run):05d}--{source_run_module}"
    path = os.path.join(path_dir, dataset, run_name)
    if not (os.path.isdir(path) and os.listdir(path)):
        raise FileNotFoundError(f"source run dir not found or empty: {path}")
    return path


def list_dir_recursively_with_ignore(dir_path, ignores=None,
                                     add_base_to_relative=False):
    """All files under dir_path as (absolute, relative) pairs, pruning any
    path component matching an ignore pattern (parity: dnnlib-style
    util_general.py:134-163)."""
    import fnmatch

    ignores = ignores or []
    base = os.path.basename(dir_path.rstrip(os.sep))
    out = []
    for root, dirs, files in os.walk(dir_path):
        dirs[:] = [d for d in dirs
                   if not any(fnmatch.fnmatch(d, pat) for pat in ignores)]
        for fname in files:
            if any(fnmatch.fnmatch(fname, pat) for pat in ignores):
                continue
            abs_path = os.path.join(root, fname)
            rel = os.path.relpath(abs_path, dir_path)
            if add_base_to_relative:
                rel = os.path.join(base, rel)
            out.append((abs_path, rel))
    return out


def copy_files_and_create_dirs(files):
    """Copy (source, destination) pairs, creating destination dirs
    (parity: util_general.py:180-189)."""
    import shutil

    for src, dst in files:
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)


# Task-label maps (parity: util_general.py:44-93).

class iid_class:
    def __init__(self, iid_label=None):
        self.iid_label = [0, 2, 3, 4, 6, 7, 8, 9] if iid_label is None \
            else iid_label

    def idx_to_idx_iid_class(self, idx):
        assert idx < len(self.iid_label)
        return self.iid_label[idx]


_OS_CLASSES = {0: "alive", 1: "death"}
_ADA_CLASSES = {0: "na", 1: "a"}


def idx_to_class_os(class_id):
    return _OS_CLASSES.get(class_id)


def class_to_idx_os(class_name):
    return {v: k for k, v in _OS_CLASSES.items()}.get(class_name)


def idx_to_class_ada(class_id):
    return _ADA_CLASSES.get(class_id)


def class_to_idx_ada(class_name):
    return {v: k for k, v in _ADA_CLASSES.items()}.get(class_name)


def get_idx_to_class(task_name, class_id):
    if task_name == "adaptive":
        return idx_to_class_ada(class_id)
    if task_name == "overall_survival":
        return idx_to_class_os(class_id)
    raise ValueError(task_name)


def get_class_to_idx(task_name, class_name):
    if task_name == "adaptive":
        return class_to_idx_ada(class_name)
    if task_name == "overall_survival":
        return class_to_idx_os(class_name)
    raise ValueError(task_name)

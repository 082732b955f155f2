"""General helpers (parity: reference utils/util_general.py).

Covers the subset actually used by the augmentation pipeline: list parsing,
seeding, run-dir management, and the `list_dict` accumulator.
"""

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

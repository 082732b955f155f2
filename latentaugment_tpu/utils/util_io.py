"""Pickle/json IO helpers (parity: reference utils/util_io.py:64-71)."""

import json
import os
import pickle
import uuid


def read_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def write_pickle(obj, path):
    with open(path, "wb") as f:
        pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)


def write_pickle_atomic(obj, path):
    """Atomic write via os.replace of a uniquely named temp file.

    Mirrors the race-safe cache write pattern of reference
    metrics/metric_utils.py:255-259.
    """
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def read_json(path):
    with open(path, "r") as f:
        return json.load(f)


def write_json(obj, path, indent=2):
    with open(path, "w") as f:
        json.dump(obj, f, indent=indent)


def append_jsonl(obj, path):
    with open(path, "at") as f:
        f.write(json.dumps(obj) + "\n")

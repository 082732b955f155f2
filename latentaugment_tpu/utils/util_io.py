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


def get_string_datetime():
    """Today as 'YYYYMMDD' (parity: ref util_io.py:38-49)."""
    import datetime

    return datetime.datetime.now().strftime("%Y%m%d")


def write_list_to_file(my_list, path):
    """One item per line (parity: ref util_io.py:52-55)."""
    with open(path, "w+") as f:
        for item in my_list:
            f.write(f"{item}\n")


def read_file_to_list(path):
    """Lines incl. newlines, as readlines() (parity: ref util_io.py:58-61)."""
    with open(path, "r") as f:
        return f.readlines()


def add_to_zip(zip_obj, patient, split):
    """Add a patient dir's .pickle (or .png) files to an open ZipFile under
    `<split>/<patient>/<file>` (parity: ref util_io.py:73-86)."""
    import glob

    from . import util_path

    files = glob.glob(os.path.join(patient, "*.pickle"))
    if not files:
        files = glob.glob(os.path.join(patient, "*.png"))
    for file in files:
        arcname = os.path.join(
            split,
            util_path.get_filename_without_extension(patient),
            util_path.get_filename(file),
        )
        zip_obj.write(file, arcname)


def write_excel(*keys, dictionary, sheet_idx, col_position=1, wb=None,
                ws=None, default="not found"):
    """Dump per-fold id/label arrays to an openpyxl sheet (parity: ref
    util_io.py:9-36). Gated on openpyxl; raises ImportError without it."""
    import numpy as np
    import openpyxl

    if wb is None:
        wb = openpyxl.Workbook()
        ws = wb.active
        ws.title = "_fold" + str(sheet_idx)
    if ws is None:
        ws = wb.create_sheet(title="_fold" + str(sheet_idx))

    ws.cell(row=1, column=col_position, value=keys[0].split("_")[1] + "_id")
    ws.cell(row=1, column=col_position + 1,
            value=keys[0].split("_")[1] + "_label")
    for idx in range(dictionary.get(keys[0], default).shape[0]):
        for key, column in zip(keys, np.arange(len(keys))):
            ws.cell(row=idx + 2, column=col_position + int(column),
                    value=dictionary.get(key, default)[idx, 0])
    return wb, ws

"""Path helpers (parity: reference utils/util_path.py)."""

import ntpath
import os


def create_dir(path):
    os.makedirs(path, exist_ok=True)
    return path


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def mkdirs(paths):
    if isinstance(paths, (list, tuple)):
        for p in paths:
            mkdir(p)
    else:
        mkdir(paths)


def split_dos_path_into_components(path):
    """Split a path (either / or \\ separated) into its components.

    Parity: reference utils/util_path.py split_dos_path_into_components —
    the zip archives store DOS-style paths, so handle both separators.
    """
    normalized = path.replace("\\", "/")
    parts = [p for p in normalized.split("/") if p not in ("", ".")]
    return parts


def get_filename_without_extension(path):
    base = ntpath.basename(path.replace("\\", "/"))
    return os.path.splitext(base)[0]


def get_filename(path):
    return ntpath.basename(path.replace("\\", "/"))


def get_parent_dir(path):
    return os.path.dirname(os.path.abspath(path))


def listdir_nohidden(path):
    """Yield non-hidden entry names (parity: util_path.py:32-35)."""
    for f in os.listdir(path):
        if not f.startswith("."):
            yield f


def listdir_nohidden_with_path(path):
    """Non-hidden entries as full paths (parity: util_path.py:37-38)."""
    import glob

    return glob.glob(os.path.join(path, "*"))

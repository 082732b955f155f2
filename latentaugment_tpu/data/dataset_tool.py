"""Offline dataset preprocessing CLI.

Parity: reference data/dataset_tool.py (treated as the pipeline spec —
SURVEY.md §2.3 notes the original is not runnable as-is): processing
steps `normalize -> snap_pickle -> split -> snap_zip`, with the same
on-disk products — per-slice `<patient>/<patient>_<NNNNN>.pickle`
modality dicts, `<split>` partitioned zips, sanity-check PNGs, and the
power-of-two/square shape contract the SG2 pipeline requires.

Volume IO: `.npy` volumes ([D, H, W] per modality file) load natively;
`.nii/.nii.gz` require nibabel (gated — not in this image); DICOM
ingestion requires pydicom (gated). Normalization follows the
Pelvis_2.1 rules (percentile/range clip -> [0, 255]).
"""

import glob
import json
import os
import random
import shutil
import zipfile

import click
import numpy as np

from ..utils import util_io, util_path


# ----------------------------------------------------------------------------
# Volume IO

def load_volume(path):
    """[D, H, W] float array from .npy or .nii(.gz)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith((".nii", ".nii.gz", ".gz")):
        try:
            import nibabel as nib
        except ImportError as e:
            raise ImportError(
                "nibabel is required for NIfTI volumes and is not installed; "
                "convert volumes to .npy") from e
        data = nib.load(path).get_fdata()
        # NIfTI is [H, W, D]; reorder to [D, H, W].
        return np.transpose(data, (2, 0, 1))
    raise IOError(f"unsupported volume format: {path}")


# ----------------------------------------------------------------------------
# Normalization (parity: dataset_tool.py:295-374)

def get_normalization_range(data, data_options):
    if data_options.get("upper_percentile") is not None:
        upper = np.percentile(data, data_options["upper_percentile"])
    elif data_options.get("range", {}).get("max") is not None:
        upper = data_options["range"]["max"]
    else:
        upper = data.max()

    if data_options.get("lower_percentile") is not None:
        lower = np.percentile(data, data_options["lower_percentile"])
    elif data_options.get("range", {}).get("min") is not None:
        lower = data_options["range"]["min"]
    else:
        lower = data.min()
    return upper, lower


def normalize_per_dataset(data, dataset, modes_args, low=0.0, hi=255.0):
    if dataset.startswith("Pelvis"):
        upper, lower = get_normalization_range(data, modes_args)
        data = np.clip(data, lower, upper)
        data = (data - lower) / max(upper - lower, 1e-12)
        return data * (hi - low) + low
    if dataset == "claro":
        return data
    raise NotImplementedError(f"Normalization for {dataset} was not implemented.")


# ----------------------------------------------------------------------------
# Slicing -> per-slice pickle dicts (parity: convert_dataset_mi :570-704)

def iterate_patient_slices(source, transpose_img=True):
    """Yield {folder_name, name, depth_index, total_depth, img(dict)} per
    slice from `<source>/<patient>/<modality>.{npy,nii.gz}` volumes."""
    folders = sorted(f for f in glob.glob(os.path.join(source, "*"))
                     if os.path.isdir(f))
    for folder in folders:
        patient = util_path.get_filename_without_extension(folder)
        vols = {}
        for file_mode in sorted(glob.glob(os.path.join(folder, "*"))):
            mode = util_path.get_filename_without_extension(file_mode)
            mode = mode.replace(".nii", "")
            vols[mode] = load_volume(file_mode)
        if not vols:
            continue
        depth = min(v.shape[0] for v in vols.values())
        for d in range(depth):
            img = {}
            for mode, vol in vols.items():
                sl = vol[d]
                if transpose_img:
                    sl = sl.transpose(1, 0)
                img[mode] = sl
            yield dict(folder_name=patient, name=f"{patient}_{d:05d}",
                       depth_index=d, total_depth=depth, img=img)


def snap_pickle(source, dest, source_mask=None, pop_range=10,
                apply_mask=False, is_overwrite=False, sanity_check_prob=0.05):
    """Slice volumes into `<dest>/temp/<patient>/<name>.pickle` dicts.

    Skips `pop_range` slices at both stack ends (CT registration issues),
    honors a CT_registration_problem.json skip list, optionally applies a
    binary mask volume, enforces square power-of-two shapes, and dumps
    sanity PNGs for a random subset.
    """
    reg_problems = {}
    reg_file = os.path.join(dest, "CT_registration_problem.json")
    if os.path.exists(reg_file):
        with open(reg_file) as f:
            reg_problems = json.load(f)

    temp = os.path.join(dest, "temp")
    if os.path.isdir(temp) and is_overwrite:
        shutil.rmtree(temp)
    util_path.create_dir(temp)

    mask_iter = None
    if apply_mask and source_mask:
        mask_iter = iterate_patient_slices(source_mask)

    dataset_attrs = None
    n_written = 0
    for image in iterate_patient_slices(source):
        folder_name = image["folder_name"]
        out_path = os.path.join(temp, folder_name, image["name"] + ".pickle")
        util_path.create_dir(os.path.dirname(out_path))

        if not is_overwrite and os.path.exists(out_path):
            continue
        d, total = image["depth_index"], image["total_depth"]
        if d < pop_range or d >= total - pop_range:
            continue
        if folder_name in reg_problems:
            lo, hi_ = reg_problems[folder_name]
            if (lo != -1 and d < lo) or (lo == -1 and d > hi_):
                continue

        img = image["img"]
        if mask_iter is not None:
            mask_image = next(mask_iter)
            mask = mask_image["img"]["mask"].astype(np.uint8)
            for mode in sorted(img):
                img[mode] = np.multiply(img[mode], mask).astype(np.float64)

        modalities = sorted(img.keys())
        cur_attrs = dict(width=img[modalities[0]].shape[1],
                         height=img[modalities[0]].shape[0],
                         modalities=modalities)
        if dataset_attrs is None:
            dataset_attrs = cur_attrs
            w, h = cur_attrs["width"], cur_attrs["height"]
            if w != h:
                raise click.ClickException(
                    f"Images are required to be square. Got {w}x{h}")
            if w != 2 ** int(np.floor(np.log2(w))):
                raise click.ClickException(
                    "Image width/height are required to be power-of-two")
        elif dataset_attrs != cur_attrs:
            raise click.ClickException(
                f"Image {out_path} attributes must be equal across the dataset")

        if random.random() < sanity_check_prob:
            _sanity_png(img, dest, folder_name, image["name"])

        util_io.write_pickle(img, out_path)
        n_written += 1
    print(f"snap_pickle: wrote {n_written} slices to {temp}")
    return temp


def _sanity_png(img, dest, patient, name):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    sdir = os.path.join(dest, "sanity_check", patient)
    util_path.create_dir(sdir)
    modes = sorted(img)
    fig, axes = plt.subplots(1, len(modes), figsize=(3 * len(modes), 3))
    axes = np.atleast_1d(axes)
    for ax, mode in zip(axes, modes):
        ax.imshow(img[mode], cmap="gray")
        ax.set_title(mode, fontsize=6)
        ax.axis("off")
    fig.savefig(os.path.join(sdir, f"{name}.png"), dpi=100)
    plt.close(fig)


# ----------------------------------------------------------------------------
# Splits (parity: dataset_tool.py:708-742)

def split_list(input_list, split=0.8, shuffle_list=True, seed=None):
    items = list(input_list)
    if shuffle_list:
        random.Random(seed).shuffle(items)
    n = int(round(len(items) * split))
    return items[:n], items[n:]


def make_splits(patients, train=0.7, val=0.2, test=0.1, seed=42):
    assert abs(train + val + test - 1.0) < 1e-6
    train_p, rest = split_list(patients, split=train, seed=seed)
    val_p, test_p = split_list(rest, split=val / max(val + test, 1e-12),
                               shuffle_list=False)
    return {"train": sorted(train_p), "val": sorted(val_p),
            "test": sorted(test_p)}


def make_cv_splits(patients, n_folds=5, val_frac=0.2, seed=42):
    items = list(patients)
    random.Random(seed).shuffle(items)
    folds = [items[i::n_folds] for i in range(n_folds)]
    splits = []
    for k in range(n_folds):
        test_p = folds[k]
        rest = [p for i, f in enumerate(folds) if i != k for p in f]
        n_val = int(round(len(rest) * val_frac))
        splits.append({"train": sorted(rest[n_val:]),
                       "val": sorted(rest[:n_val]),
                       "test": sorted(test_p)})
    return splits


# ----------------------------------------------------------------------------
# Zip writer (parity: snap_zip / write_to_zip)

def snap_zip(temp_dir, dest_zip, splits):
    """Pack `<temp>/<patient>/<slice>.pickle` into
    `<split>/<patient>/<split>_<slice>.pickle` zip members."""
    patient_to_split = {p: s for s, ps in splits.items() for p in ps}
    n = 0
    with zipfile.ZipFile(dest_zip, "w", zipfile.ZIP_STORED) as zf:
        for patient in sorted(os.listdir(temp_dir)):
            pdir = os.path.join(temp_dir, patient)
            if not os.path.isdir(pdir):
                continue
            split = patient_to_split.get(patient)
            if split is None:
                continue
            for fname in sorted(os.listdir(pdir)):
                arcname = f"{split}/{patient}/{split}_{fname}"
                zf.write(os.path.join(pdir, fname), arcname)
                n += 1
    print(f"snap_zip: wrote {n} members to {dest_zip}")
    return dest_zip


# ----------------------------------------------------------------------------
# CLI

@click.group()
def main():
    """LatentAugment-TPU offline dataset tool."""


@main.command()
@click.option("--source", required=True, help="dir of <patient>/<modality> volumes")
@click.option("--dest", required=True)
@click.option("--dataset", default="Pelvis_2.1")
@click.option("--modes_config", default=None,
              help="json file: {modality: {upper_percentile, lower_percentile, range}}")
def process_normalized(source, dest, dataset, modes_config):
    """Normalize each modality volume to [0, 255] per dataset rules."""
    modes_args = {}
    if modes_config:
        with open(modes_config) as f:
            modes_args = json.load(f)
    for folder in sorted(glob.glob(os.path.join(source, "*"))):
        patient = util_path.get_filename_without_extension(folder)
        outdir = util_path.create_dir(os.path.join(dest, patient))
        for file_mode in sorted(glob.glob(os.path.join(folder, "*"))):
            mode = util_path.get_filename_without_extension(file_mode).replace(".nii", "")
            vol = load_volume(file_mode)
            vol = normalize_per_dataset(vol, dataset, modes_args.get(mode, {}))
            np.save(os.path.join(outdir, f"{mode}.npy"), vol)
            print(f"normalized {patient}/{mode}")


@main.command()
@click.option("--source", required=True)
@click.option("--dest", required=True)
@click.option("--source_mask", default=None)
@click.option("--pop_range", type=int, default=10)
@click.option("--apply_mask", is_flag=True)
@click.option("--overwrite", is_flag=True)
def snap_pickle_cmd(source, dest, source_mask, pop_range, apply_mask, overwrite):
    """Slice volumes into per-slice pickle dicts."""
    snap_pickle(source, dest, source_mask=source_mask, pop_range=pop_range,
                apply_mask=apply_mask, is_overwrite=overwrite)


@main.command()
@click.option("--temp_dir", required=True)
@click.option("--dest_zip", required=True)
@click.option("--train", type=float, default=0.7)
@click.option("--val", type=float, default=0.2)
@click.option("--test", type=float, default=0.1)
@click.option("--seed", type=int, default=42)
def snap_zip_cmd(temp_dir, dest_zip, train, val, test, seed):
    """Partition patients into splits and pack the zip."""
    patients = [p for p in sorted(os.listdir(temp_dir))
                if os.path.isdir(os.path.join(temp_dir, p))]
    splits = make_splits(patients, train, val, test, seed)
    with open(os.path.splitext(dest_zip)[0] + "_splits.json", "w") as f:
        json.dump(splits, f, indent=2)
    snap_zip(temp_dir, dest_zip, splits)


if __name__ == "__main__":
    main()

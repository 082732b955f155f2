"""Build the Mayo Clinic annotation CSVs.

Parity: reference data/create_csv_mayoclinic.py:20-89 — walks the
DICOM (or .npy) tree `<root>/<patient>/<dose-domain>/<slice files>`,
emitting train/val/test CSVs with columns [patient, domain, path_slice]
where domain is LD (low dose) / HD (high dose), paired by slice order.
"""

import os

import click


def collect_slices(root, domains=("LD", "HD"), exts=(".dcm", ".ima", ".npy")):
    rows = []
    for patient in sorted(os.listdir(root)):
        pdir = os.path.join(root, patient)
        if not os.path.isdir(pdir):
            continue
        for domain_dir in sorted(os.listdir(pdir)):
            domain = None
            for d in domains:
                if d.lower() in domain_dir.lower():
                    domain = d
            if domain is None:
                continue
            ddir = os.path.join(pdir, domain_dir)
            for fname in sorted(os.listdir(ddir)):
                if os.path.splitext(fname)[1].lower() in exts:
                    rows.append(dict(patient=patient, domain=domain,
                                     path_slice=os.path.join(ddir, fname)))
    return rows


def create_annotation_file(root, dest_dir, train=0.7, val=0.2, test=0.1,
                           seed=42):
    import random

    import pandas as pd

    rows = collect_slices(root)
    patients = sorted({r["patient"] for r in rows})
    rng = random.Random(seed)
    rng.shuffle(patients)
    n_train = int(round(len(patients) * train))
    n_val = int(round(len(patients) * val))
    split_of = {}
    for i, p in enumerate(patients):
        split_of[p] = ("train" if i < n_train
                       else "val" if i < n_train + n_val else "test")

    os.makedirs(dest_dir, exist_ok=True)
    df = pd.DataFrame(rows)
    outs = {}
    for split in ("train", "val", "test"):
        sub = df[df["patient"].map(split_of) == split].reset_index(drop=True)
        out = os.path.join(dest_dir, f"mayoclinic_{split}.csv")
        sub.to_csv(out)
        outs[split] = out
        print(f"{split}: {len(sub)} slices -> {out}")
    return outs


@click.command()
@click.option("--root", required=True)
@click.option("--dest_dir", required=True)
@click.option("--seed", type=int, default=42)
def main(root, dest_dir, seed):
    create_annotation_file(root, dest_dir, seed=seed)


if __name__ == "__main__":
    main()

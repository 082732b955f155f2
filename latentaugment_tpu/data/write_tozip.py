"""Zip inverted-latent pickle folders into the dataset layout.

Parity: reference data/write_tozip.py:30-94 — packs per-patient folders
of inverted-code pickles into `<split>/<patient>/<slice>` zip members,
mirroring the image zip's member naming so the engine can look latents
up by image filename (augments/latent_aug.py:310-324).
"""

import os
import zipfile

import click


def write_to_zip(source_dir, dest_zip, splits_map=None, default_split="train"):
    """source_dir: <patient>/<slice>.pickle folders. splits_map: patient ->
    split name (default: everything into `default_split`)."""
    n = 0
    with zipfile.ZipFile(dest_zip, "w", zipfile.ZIP_STORED) as zf:
        for patient in sorted(os.listdir(source_dir)):
            pdir = os.path.join(source_dir, patient)
            if not os.path.isdir(pdir):
                continue
            split = (splits_map or {}).get(patient, default_split)
            for fname in sorted(os.listdir(pdir)):
                if not fname.endswith(".pickle"):
                    continue
                arc = f"{split}/{patient}/{fname}"
                zf.write(os.path.join(pdir, fname), arc)
                n += 1
    print(f"write_to_zip: {n} members -> {dest_zip}")
    return dest_zip


@click.command()
@click.option("--source_dir", required=True)
@click.option("--dest_zip", required=True)
@click.option("--splits_json", default=None,
              help="json of {split: [patients]} (dataset_tool output)")
def main(source_dir, dest_zip, splits_json):
    splits_map = None
    if splits_json:
        import json

        with open(splits_json) as f:
            splits = json.load(f)
        splits_map = {p: s for s, ps in splits.items() for p in ps}
    write_to_zip(source_dir, dest_zip, splits_map)


if __name__ == "__main__":
    main()

"""dataset_tool front half on synthetic volumes (VERDICT #8).

Covers DICOM series assembly (pydicom-free via stand-in objects), volume
resize, per-dataset masking morphology, and the full prepare_Pelvis_2_1
recipe chain down to a zip the PelvisDataset can read.
"""

import os
import zipfile

import numpy as np
import pytest

from latentaugment_tpu.data import dataset_tool as dt


class _FakeDicomSlice:
    def __init__(self, pixels, z=None, instance=None, slope=1.0,
                 intercept=0.0):
        self.pixel_array = pixels
        if z is not None:
            self.ImagePositionPatient = [0.0, 0.0, float(z)]
        if instance is not None:
            self.InstanceNumber = instance
        self.RescaleSlope = slope
        self.RescaleIntercept = intercept


def test_assemble_dicom_series_sorts_and_rescales():
    rs = np.random.RandomState(0)
    planes = [rs.randint(0, 100, (8, 8)).astype(np.int16) for _ in range(4)]
    # Shuffled z positions; HU rescale slope/intercept.
    slices = [_FakeDicomSlice(planes[i], z=[30, 10, 40, 20][i], slope=2.0,
                              intercept=-1000.0) for i in range(4)]
    vol = dt.assemble_dicom_series(slices)
    assert vol.shape == (4, 8, 8)
    order = [1, 3, 0, 2]  # by z: 10, 20, 30, 40
    for d, i in enumerate(order):
        np.testing.assert_allclose(vol[d], planes[i] * 2.0 - 1000.0)


def test_assemble_dicom_series_instance_number_fallback():
    planes = [np.full((4, 4), i, np.float32) for i in range(3)]
    slices = [_FakeDicomSlice(planes[i], instance=[3, 1, 2][i])
              for i in range(3)]
    vol = dt.assemble_dicom_series(slices)
    np.testing.assert_allclose(vol[:, 0, 0], [1.0, 2.0, 0.0])


def test_convert_dicom_2_nifti_gated():
    try:
        import pydicom  # noqa: F401

        pytest.skip("pydicom present; gate not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pydicom"):
        dt.convert_dicom_2_nifti("/nonexistent", "/nonexistent", ["CT"])


def test_resize_volume_linear():
    vol = np.zeros((2, 8, 8))
    vol[:, 2:6, 2:6] = 1.0
    out = dt.resize_volume(vol, (16, 16))
    assert out.shape == (2, 16, 16)
    # Mass approximately preserved under linear in-plane resampling.
    assert abs(out[0].mean() - vol[0].mean()) < 0.05
    near = dt.resize_volume(vol, (4, 4), interpolation="nearest")
    assert set(np.unique(near)) <= {0.0, 1.0}


def test_resize_folder_roundtrip(tmp_path):
    src = tmp_path / "vols" / "patient001"
    os.makedirs(src)
    np.save(src / "MR_nonrigid_CT.npy", np.random.RandomState(0).rand(3, 8, 8))
    np.save(src / "MR_MR_T2.npy", np.random.RandomState(1).rand(3, 8, 8))
    done = dt.resize_nifti_folder(str(tmp_path / "vols"),
                                  str(tmp_path / "resized"), (16, 16))
    assert done == ["patient001"]
    out = dt.load_volume(str(tmp_path / "resized" / "patient001" /
                             "MR_nonrigid_CT.npy"))
    assert out.shape == (3, 16, 16)


def test_largest_region_and_small_region_removal():
    m = np.zeros((10, 10), np.uint8)
    m[1:5, 1:5] = 1  # 16 px blob
    m[8:10, 8:10] = 1  # 4 px blob
    big = dt.get_largest_connected_region(m)
    assert big[2, 2] == 1 and big[9, 9] == 0
    cleaned = dt.remove_small_regions(m.copy(), min_size=10)
    assert cleaned[2, 2] == 1 and cleaned[9, 9] == 0


def test_intensity_mask_separates_foreground():
    rs = np.random.RandomState(0)
    vol = rs.normal(5.0, 1.0, (4, 32, 32))  # background
    vol[:, 8:24, 8:24] = rs.normal(120.0, 5.0, (4, 16, 16))  # tissue
    m = dt.compute_intensity_mask(vol)
    assert m[:, 16, 16].all()  # center is tissue
    assert not m[:, 2, 2].any()  # corner is background


@pytest.mark.parametrize("dataset", ["Pelvis_2.1", "spleen", "heart", "kits19"])
def test_build_mask_volume_recipes(dataset):
    rs = np.random.RandomState(1)
    vol = rs.normal(1.0, 0.5, (3, 32, 32))
    vol[:, 10:22, 10:22] = rs.normal(150.0, 10.0, (3, 12, 12))
    m = dt.build_mask_volume(vol, dataset)
    assert m.shape == vol.shape
    assert set(np.unique(m)) <= {0, 1}
    assert m[:, 16, 16].all(), f"{dataset} mask misses the bright core"


def test_prepare_pelvis_recipe_end_to_end(tmp_path):
    """Full chain on synthetic npy volumes -> zip readable by PelvisDataset."""
    rs = np.random.RandomState(0)
    for p in ("patient001", "patient002", "patient003"):
        pdir = tmp_path / "raw" / p
        os.makedirs(pdir)
        base = rs.rand(8, 13, 13) * 1500.0  # odd in-plane size, deep enough
        np.save(pdir / "MR_nonrigid_CT.npy", base)
        np.save(pdir / "MR_MR_T2.npy", base * 0.5 + 10.0)

    dest_zip = str(tmp_path / "pelvis.zip")
    out_zip, splits = dt.prepare_pelvis_2_1(
        str(tmp_path / "raw"), str(tmp_path / "interim"), dest_zip,
        image_shape=(16, 16), pop_range=2, apply_mask=True,
        splits=(0.4, 0.3, 0.3), seed=0)

    assert os.path.isfile(out_zip)
    assert sorted(sum(splits.values(), [])) == ["patient001", "patient002",
                                                "patient003"]
    with zipfile.ZipFile(out_zip) as zf:
        names = zf.namelist()
    # 8 slices - 2*pop_range = 4 per patient.
    assert len(names) == 12
    assert all(n.split("/")[0] in ("train", "val", "test") for n in names)

    # The product dataset reads the zip.
    from latentaugment_tpu.augments.manifold import ImgDataset

    split = next(s for s, ps in splits.items() if ps)
    ds = ImgDataset(path=out_zip, modalities=["MR_nonrigid_CT", "MR_MR_T2"],
                    split=split, resolution=16)
    img, fname = ds[0]
    assert img.shape == (2, 16, 16)
    assert np.isfinite(img).all()


# ----------------------------------------------------------------------------
# TIFF pipeline + claro recipe (ref dataset_tool.py:874-982, 1055-1117)

def _make_claro_fixture(tmp_path, n_patients=2, n_slices=3, size=20):
    """Synthetic claro layout: float tiff slices + bootstrap/folds/all.txt."""
    from PIL import Image

    rs = np.random.RandomState(7)
    raw = tmp_path / "raw"
    interim = tmp_path / "interim"
    folds = interim / "bootstrap" / "folds"
    os.makedirs(folds)
    rows = ["img label"]
    for p in range(n_patients):
        patient = f"claro{p:03d}"
        os.makedirs(raw / patient)
        for s in range(n_slices):
            hu = rs.rand(size, size) * 2400.0 - 1200.0  # HU-ish range
            Image.fromarray(hu.astype(np.float32)).save(
                raw / patient / f"{patient}_{s:05d}.tif", "tiff")
            rows.append(f"{patient}/{patient}_{s:05d}.tif {p % 2}")
    (folds / "all.txt").write_text("\n".join(rows) + "\n")
    return str(raw), str(interim)


def test_transform_tiff_slice_math():
    img = np.array([[-2000.0, 0.0], [500.0, 3000.0]])
    out = dt.transform_tiff_slice(
        img, resolution=2, clip={"min": -1000, "max": 1000},
        scale={"min": -1000, "max": 1000}, scale_by_255=True)
    assert out.dtype == np.float64
    # clip(-2000)->-1000 -> 0.0; clip(3000)->1000 -> 255; 500 -> 0.75*255
    np.testing.assert_allclose(out, [[0.0, 127.5], [191.25, 255.0]])


def test_apply_box_masks_outside():
    img = np.arange(16, dtype=np.float64).reshape(4, 4) + 5.0
    out = dt.apply_box_to_slice(img, [1, 1, 3, 3], box_value="min")
    assert out[0, 0] == img.min()
    np.testing.assert_array_equal(out[1:3, 1:3], img[1:3, 1:3])
    out2 = dt.apply_box_to_slice(img, [1, 1, 3, 3], box_value="-7")
    assert out2[3, 3] == -7.0


def test_process_tiff_writes_pickles(tmp_path):
    raw, interim = _make_claro_fixture(tmp_path)
    import json as _json

    boxdir = tmp_path / "boxes"
    os.makedirs(boxdir)
    with open(boxdir / "boxes.json", "w") as f:
        _json.dump({"claro000": [2, 2, 18, 18]}, f)

    temp = dt.process_tiff(
        source=raw, source_interim=interim, source_box=str(boxdir),
        dest=str(tmp_path / "out"), dataset="claro", resolution=16,
        box_value="min", clip={"min": -1000, "max": 1000},
        scale={"min": -1000, "max": 1000}, convert_to_uint8=False,
        scale_by_255=True, sanity_check_prob=1.0)

    from latentaugment_tpu.utils import util_io

    picks = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(temp) for f in fs)
    assert len(picks) == 6
    img = util_io.read_pickle(picks[0])
    assert set(img) == {"CT"}
    assert img["CT"].shape == (16, 16)
    assert img["CT"].dtype == np.float64
    assert img["CT"].min() >= 0.0 and img["CT"].max() <= 255.0
    # Sanity tiffs were dumped (prob=1.0).
    assert os.path.isdir(os.path.join(str(tmp_path / "out"), "sanity_check"))


def test_process_tiff_rejects_non_pow2(tmp_path):
    raw, interim = _make_claro_fixture(tmp_path, n_patients=1, n_slices=1)
    import click

    with pytest.raises(click.ClickException, match="power-of-two"):
        dt.process_tiff(
            source=raw, source_interim=interim, source_box=None,
            dest=str(tmp_path / "out"), dataset="claro", resolution=20,
            box_value="min", clip=None, scale=None, convert_to_uint8=False,
            scale_by_255=True)


def test_run_cli_claro_end_to_end(tmp_path):
    """Reference-parity entry: run --processing_step process_tiff, then
    snap_zip, from a yaml config (ref dataset_tool.py:985-1117)."""
    from click.testing import CliRunner

    raw, interim_src = _make_claro_fixture(tmp_path)
    cfg = {
        "data": {
            "resolution": 16,
            "modes": {"CT": {"clip": {"min": -1000, "max": 1000},
                             "scale": {"min": -1000, "max": 1000}}},
            "options": {"apply_box": False, "box_value": "min",
                        "transpose_img": False, "convert_to_uint8": False,
                        "scale_by_255": True},
            "validation": {"name": "hold_out", "split": [0.5, 0.5, 0.0],
                           "n_exp": 1},
        }
    }
    import yaml

    cfg_file = tmp_path / "claro.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    interim_root = str(tmp_path / "interim_out")
    reports = str(tmp_path / "reports")
    runner = CliRunner()

    # all.txt is read from <interim_dir>/<dataset>/bootstrap/folds/all.txt.
    dataset_interim = os.path.join(interim_root, "claro")
    os.makedirs(os.path.join(dataset_interim, "bootstrap", "folds"))
    import shutil as _sh

    _sh.copy(os.path.join(interim_src, "bootstrap", "folds", "all.txt"),
             os.path.join(dataset_interim, "bootstrap", "folds", "all.txt"))

    r1 = runner.invoke(dt.main, [
        "run", "--configuration_file", str(cfg_file), "--data_dir", raw,
        "--interim_dir", interim_root, "--reports_dir", reports,
        "--dataset", "claro", "--processing_step", "process_tiff"])
    assert r1.exit_code == 0, r1.output
    temp = os.path.join(dataset_interim, "temp")
    assert os.path.isdir(temp)

    r2 = runner.invoke(dt.main, [
        "run", "--configuration_file", str(cfg_file),
        "--data_dir", dataset_interim, "--interim_dir", interim_root,
        "--reports_dir", reports, "--dataset", "claro",
        "--processing_step", "snap_zip"])
    assert r2.exit_code == 0, r2.output
    zips = [f for f in os.listdir(dataset_interim) if f.endswith(".zip")]
    assert len(zips) == 1 and zips[0].startswith("claro-num-")
    with zipfile.ZipFile(os.path.join(dataset_interim, zips[0])) as zf:
        names = zf.namelist()
    assert len(names) == 6
    assert all(n.split("/")[0] in ("train", "val", "test") for n in names)


def test_run_cli_accepts_all_reference_steps():
    """The --processing_step choice surface matches ref :997 exactly."""
    assert dt.REFERENCE_STEPS == [
        "process_dicom_2_nifti", "process_nifti_resized",
        "process_nifti_normalized", "mask_nifti", "snap_pickle", "snap_zip",
        "process_tiff"]


def test_run_cli_pelvis_snap_zip_step(tmp_path):
    """Pelvis dispatch through the reference-parity entry."""
    from click.testing import CliRunner
    import yaml

    temp = tmp_path / "pickles" / "temp"
    for p in ("patient001", "patient002"):
        os.makedirs(temp / p)
        from latentaugment_tpu.utils import util_io

        util_io.write_pickle({"CT": np.zeros((4, 4))},
                             str(temp / p / f"{p}_00000.pickle"))
    cfg = {"data": {"resolution": 16, "modes": {},
                    "options": {},
                    "validation": {"name": "hold_out",
                                   "split": [0.5, 0.5, 0.0], "n_exp": 1}}}
    cfg_file = tmp_path / "pelvis.yaml"
    cfg_file.write_text(yaml.safe_dump(cfg))
    runner = CliRunner()
    r = runner.invoke(dt.main, [
        "run", "--configuration_file", str(cfg_file),
        "--data_dir", str(tmp_path / "pickles"),
        "--interim_dir", str(tmp_path / "interim"),
        "--reports_dir", str(tmp_path / "reports"),
        "--dataset", "Pelvis_2.1", "--processing_step", "snap_zip"])
    assert r.exit_code == 0, r.output
    out_dir = os.path.join(str(tmp_path / "interim"), "Pelvis_2.1")
    zips = [f for f in os.listdir(out_dir) if f.endswith(".zip")]
    assert len(zips) == 1

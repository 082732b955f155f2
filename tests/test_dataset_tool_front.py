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

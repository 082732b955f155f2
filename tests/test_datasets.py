"""Dataset-module tests: mayoclinic/vce npy paths, transforms, loaders."""

import numpy as np
import pytest

RNG = np.random.RandomState(5)


def _opt(**kw):
    import argparse

    ns = argparse.Namespace()
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_mayoclinic_dataset_npy(tmp_path):
    import pandas as pd

    from latentaugment_tpu.data.mayoclinic_dataset import MayoClinicDataset

    rows = []
    for i in range(3):
        for dom in ("HD", "LD"):
            p = tmp_path / f"{dom}_{i}.npy"
            np.save(p, RNG.rand(32, 32).astype(np.float32) * 3000 - 1000)
            rows.append(dict(patient=f"L{i}", domain=dom, path_slice=str(p)))
    csv = tmp_path / "ann.csv"
    pd.DataFrame(rows).to_csv(csv)

    opt = _opt(dataroot=str(csv), modalities="HD,LD", lower=-1000, upper=2000,
               img_shape=16, plot_verbose=False, model_name="pix2pix")
    ds = MayoClinicDataset(opt)
    assert len(ds) == 3
    item = ds[0]
    assert item["A"].shape == (1, 16, 16)
    assert item["B"].shape == (1, 16, 16)
    assert item["A"].min() >= -1.0 and item["A"].max() <= 1.0


def test_mayoclinic_normalize_math():
    from latentaugment_tpu.data.mayoclinic_dataset import (
        clip_img, normalize_img)

    x = np.array([-2000.0, -1000.0, 500.0, 2000.0, 3000.0])
    c = clip_img(x, -1000, 2000)
    assert c.min() == -1000 and c.max() == 2000
    n = normalize_img(c, -1000, 2000)
    np.testing.assert_allclose(n, [-1, -1, 0, 1, 1])


def test_vce_dataset_npy(tmp_path):
    import pandas as pd

    from latentaugment_tpu.data.vce_dataset import VCEDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    for i in range(2):
        np.save(img_dir / f"le_{i}.npy", RNG.rand(40, 30).astype(np.float32) * 4000)
        np.save(img_dir / f"des_{i}.npy", RNG.rand(40, 30).astype(np.float32) * 4000)
        rows.append(dict(img_x=f"le_{i}.npy", img_y=f"des_{i}.npy", r_l="R",
                         wc_x=2000, ww_x=2000, wc_y=2000, ww_y=2000))
    csv = tmp_path / "ann.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    opt = _opt(dataroot=str(csv), modalities="LE,DES", model_name="pix2pix",
               img_dim=32, img_dir=str(img_dir), annotations_csv=str(csv),
               do_augmentation=True, phase="train")
    ds = VCEDataset(opt)
    assert len(ds) == 2
    item = ds[0]
    assert item["A"].shape == (1, 32, 32)
    assert item["B"].shape == (1, 32, 32)
    assert np.isfinite(item["A"]).all()
    assert 0.0 <= item["A"].min() and item["A"].max() <= 1.0


def test_vce_pad_and_zoom():
    from latentaugment_tpu.data.vce_dataset import clipped_zoom, pad

    img = RNG.rand(40, 30).astype(np.float32)
    sq_r = pad(img, "R")
    assert sq_r.shape == (40, 40)
    np.testing.assert_array_equal(sq_r[:, 10:], img)  # R pads on the left
    sq_l = pad(img, "L")
    np.testing.assert_array_equal(sq_l[:, :30], img)  # L pads on the right

    z = clipped_zoom(np.ones((32, 32), np.float32), 1.1)
    assert z.shape == (32, 32)
    z2 = clipped_zoom(np.ones((32, 32), np.float32), 0.9)
    assert z2.shape == (32, 32)


def test_base_dataset_transforms():
    from latentaugment_tpu.data.base_dataset import get_params, get_transform

    opt = _opt(preprocess="resize_and_crop", load_size=32, crop_size=16,
               no_flip=True)
    params = get_params(opt, (64, 64))
    assert 0 <= params["crop_pos"][0] <= 16
    tf = get_transform(opt, params)
    img = (RNG.rand(64, 64) * 255).astype(np.uint8)
    out = tf(img)
    assert out.shape == (1, 16, 16)
    assert -1.0 <= out.min() and out.max() <= 1.0


def test_base_dataset_flip_default_on():
    """Without a no_flip attr the pix2pix default is flip ENABLED
    (regression: getattr default True made flips unreachable)."""
    from latentaugment_tpu.data.base_dataset import get_transform

    opt = _opt(preprocess="none", load_size=16, crop_size=16)
    img = np.arange(16 * 16, dtype=np.float32).reshape(16, 16)
    out = get_transform(opt, params={"crop_pos": (0, 0), "flip": True},
                        convert=False)(img)
    np.testing.assert_array_equal(np.asarray(out), img[:, ::-1])


def test_str2bool():
    import pytest as _pytest

    from latentaugment_tpu.options.base_options import str2bool

    assert str2bool("False") is False and str2bool("0") is False
    assert str2bool("True") is True and str2bool("yes") is True
    assert str2bool(True) is True
    import argparse
    with _pytest.raises(argparse.ArgumentTypeError):
        str2bool("maybe")


def test_pelvis_split_component_match(tmp_path):
    """Phase selects by leading path component: a val patient whose name
    contains 'train' must not leak into the train split (regression:
    substring phase match)."""
    import pickle
    import zipfile

    from latentaugment_tpu.data.pelvis_dataset import PelvisDataset

    sl = {"MR_nonrigid_CT": (RNG.rand(8, 8) * 255).astype(np.float32),
          "MR_MR_T2": (RNG.rand(8, 8) * 255).astype(np.float32)}
    zp = tmp_path / "pelvis.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("train/patient001/patient001_00000.pickle",
                    pickle.dumps(sl))
        zf.writestr("val/trainor002/trainor002_00000.pickle",
                    pickle.dumps(sl))

    opt = _opt(dataroot=str(zp), modalities="MR_nonrigid_CT,MR_MR_T2",
               phase="train", load_size=8)
    ds = PelvisDataset(opt)
    assert [p.split("/")[0] for p in ds.AB_paths] == ["train"]
    item = ds[0]
    assert item["A"].shape == (1, 8, 8)

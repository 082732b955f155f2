"""utils/util_general full-surface tests (parity: ref utils/util_general.py)."""

import os

import numpy as np
import pytest

from latentaugment_tpu.utils import util_general as ug


def test_parsers():
    assert ug.parse_comma_separated_list("a, b,c") == ["a", "b", "c"]
    assert ug.parse_comma_separated_list(["x"]) == ["x"]
    assert ug.parse_comma_separated_list("") == []
    assert ug.parse_separated_list_comma(["a", "b"]) == "a,b"
    assert ug.parse_range("1,2,5-7") == [1, 2, 5, 6, 7]
    assert ug.parse_range([3, 4]) == [3, 4]
    assert ug.parse_vec2("0.5,2") == (0.5, 2.0)
    assert ug.parse_vec2((1.0, 2.0)) == (1.0, 2.0)
    with pytest.raises(ValueError):
        ug.parse_vec2("1,2,3")


def test_accumulators_and_misc():
    d = ug.list_dict()
    d["k"].append(1)
    assert d["k"] == [1]
    nd = ug.nested_dict()
    nd["a"]["b"]["c"] = 1
    assert nd["a"]["b"]["c"] == 1
    assert ug.maybe_min(5, None) == 5
    assert ug.maybe_min(5, 3) == 3
    assert ug.file_ext("x/y/IMG.PNG") == ".png"
    assert ug.create_path("a", "b", 3) == os.path.join("a", "b", "3")
    assert ug.format_time(42) == "42s"
    g = ug.rgb2gray(np.ones((2, 2, 3)))
    np.testing.assert_allclose(g, np.full((2, 2), 0.9999), atol=1e-4)


def test_label_maps():
    assert ug.get_idx_to_class("overall_survival", 1) == "death"
    assert ug.get_class_to_idx("overall_survival", "alive") == 0
    assert ug.get_idx_to_class("adaptive", 0) == "na"
    assert ug.get_class_to_idx("adaptive", "a") == 1
    with pytest.raises(ValueError):
        ug.get_idx_to_class("nope", 0)
    assert ug.iid_class().idx_to_idx_iid_class(2) == 3


def test_run_dirs_and_files(tmp_path):
    root = str(tmp_path / "runs")
    # Created runs resolve through define_source_path without renaming
    # (round-3 review: bare-id names were unresolvable by the
    # '--'-keyed source lookup).
    d1 = ug.create_run_dir_local(root, "mod")
    assert os.path.basename(d1) == "00000--mod"
    os.rename(d1, os.path.join(root, "00007--mod"))
    open(os.path.join(root, "00007--mod", "params.txt"), "w").write("p")
    d2 = ug.create_run_dir_local(root, "mod")
    assert os.path.basename(d2) == "00008--mod"

    assert ug.isempty(d2)
    f = os.path.join(d2, "a.txt")
    open(f, "w").write("hi")
    assert not ug.isempty(d2)

    found = ug.define_source_path(root, "", source_id_run=7,
                                  source_run_module="mod")
    assert found.endswith("00007--mod")
    with pytest.raises(FileNotFoundError):
        ug.define_source_path(root, "", source_id_run=99,
                              source_run_module="mod")
    with pytest.raises(ValueError):
        ug.define_source_path(root, "")

    ug.delete_file(f)
    ug.delete_file(f)  # second delete tolerated
    assert not os.path.exists(f)


def test_recursive_listing_and_copy(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "keep.py").write_text("x")
    (src / "sub" / "deep.txt").write_text("y")
    (src / "skip.pyc").write_text("z")
    (src / "__pycache__").mkdir()
    (src / "__pycache__" / "c.pyc").write_text("w")

    pairs = ug.list_dir_recursively_with_ignore(
        str(src), ignores=["*.pyc", "__pycache__"])
    rels = sorted(r for _, r in pairs)
    assert rels == ["keep.py", os.path.join("sub", "deep.txt")]

    pairs_base = ug.list_dir_recursively_with_ignore(
        str(src), ignores=["*.pyc", "__pycache__"], add_base_to_relative=True)
    assert all(r.startswith("src") for _, r in pairs_base)

    dst = tmp_path / "dst"
    ug.copy_files_and_create_dirs(
        [(a, os.path.join(str(dst), r)) for a, r in pairs])
    assert (dst / "sub" / "deep.txt").read_text() == "y"


def test_seed_all():
    ug.seed_all(7)
    a = np.random.rand(3)
    ug.seed_all(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_util_io_helpers(tmp_path):
    from latentaugment_tpu.utils import util_io as io_

    assert len(io_.get_string_datetime()) == 8

    lst = ["a", "b", 3]
    p = str(tmp_path / "list.txt")
    io_.write_list_to_file(lst, p)
    assert io_.read_file_to_list(p) == ["a\n", "b\n", "3\n"]

    # add_to_zip: patient dir of pickles -> <split>/<patient>/<file>
    import pickle
    import zipfile

    pdir = tmp_path / "patient7"
    pdir.mkdir()
    for i in range(2):
        with open(pdir / f"s{i}.pickle", "wb") as f:
            pickle.dump({"x": i}, f)
    zpath = str(tmp_path / "out.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        io_.add_to_zip(z, str(pdir), "train")
    names = sorted(zipfile.ZipFile(zpath).namelist())
    assert names == [os.path.join("train", "patient7", "s0.pickle"),
                     os.path.join("train", "patient7", "s1.pickle")]


def test_util_path_listdir(tmp_path):
    from latentaugment_tpu.utils import util_path as up

    (tmp_path / "visible.txt").write_text("x")
    (tmp_path / ".hidden").write_text("y")
    assert list(up.listdir_nohidden(str(tmp_path))) == ["visible.txt"]
    assert [os.path.basename(p)
            for p in up.listdir_nohidden_with_path(str(tmp_path))] == \
        ["visible.txt"]


def test_util_reports_helpers(tmp_path):
    from latentaugment_tpu.utils import util_reports as ur

    cmap = ur.get_cmap(3)
    assert len(cmap(0)) == 4  # RGBA

    out = ur.plot_training({"loss": [3, 2, 1], "acc": [0.1, 0.5, 0.9]},
                           str(tmp_path), title="curves")
    assert os.path.isfile(out)

    uri = ur.embeddable_image(np.zeros((8, 8), np.float32))
    assert uri.startswith("data:image/png;base64,")

    imgs = np.random.RandomState(0).rand(3, 1, 8, 8) * 2 - 1
    paths = ur.dump_images(str(tmp_path / "dump"), imgs, "img")
    assert len(paths) == 3 and all(os.path.isfile(p) for p in paths)

    act = np.random.RandomState(1).rand(2, 9, 8, 8).astype(np.float32)
    p = ur.show_activation(act, layer="b1", report_dir=str(tmp_path))
    assert os.path.isfile(p)


def test_util_url_cache_path(monkeypatch, tmp_path):
    import importlib

    monkeypatch.setenv("LATENTAUGMENT_CACHE_DIR", str(tmp_path))
    from latentaugment_tpu.utils import util_url

    importlib.reload(util_url)
    assert util_url.make_cache_dir_path("a", "b") == str(tmp_path / "a" / "b")
    importlib.reload(util_url)  # restore module-level default afterwards


def test_analysis_parity_helpers(tmp_path):
    import pickle

    from PIL import Image

    from latentaugment_tpu.analysis import create_gif as cg
    from latentaugment_tpu.analysis import pr_analysis, umap_analysis

    assert pr_analysis.generate_mapping(2) == {0: "A", 1: "B"}

    # fromdir_tolist: sorted non-hidden pickles
    d = tmp_path / "pkls"
    d.mkdir()
    for i in [1, 0]:
        with open(d / f"{i}.pickle", "wb") as f:
            pickle.dump(i, f)
    (d / ".hidden").write_text("x")
    assert umap_analysis.fromdir_tolist(str(d)) == [0, 1]

    # create_gif_hstack pairs img/latent snapshots per epoch
    s = tmp_path / "snaps"
    s.mkdir()
    for e in range(3):
        Image.new("RGB", (32, 32), (e * 40, 0, 0)).save(s / f"img_{e}.png")
        Image.new("RGB", (16, 16), (0, e * 40, 0)).save(
            s / f"latent_{e}.png")
    out = cg.create_gif_hstack(str(s), latent_size=(32, 32))
    img = Image.open(out)
    assert img.size == (64, 32) and getattr(img, "n_frames", 1) == 3

    framed = cg.add_text_to_image(Image.new("RGB", (64, 64)), "epoch 1")
    assert framed.size == (64, 64)

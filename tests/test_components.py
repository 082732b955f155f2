"""Tests: criteria, legacy converter, data tools, misc utils, HPO, stats."""

import io
import os
import pickle
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

RNG = np.random.RandomState(11)


# ----------------------------------------------------------------------------
# Criteria

def test_lpips_criterion_properties():
    from latentaugment_tpu.augments.criteria import LPIPS

    lp = LPIPS(net_type="vgg")
    x = jnp.asarray(RNG.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    d_self = np.asarray(lp.forward(x, x))
    np.testing.assert_allclose(d_self, 0.0, atol=1e-6)
    y = jnp.asarray(RNG.rand(2, 3, 32, 32).astype(np.float32) * 2 - 1)
    d_xy = np.asarray(lp.forward(x, y))
    assert (d_xy > 0).all()

    feats = lp.extract_features(y)
    assert len(feats) == len(lp.target_layers)
    d_tr = float(lp.forward_tr(x, feats))
    assert d_tr > 0


def test_nst_loss():
    from latentaugment_tpu.augments.criteria import NSTLoss, gram_matrix

    x = jnp.asarray(RNG.rand(1, 3, 32, 32).astype(np.float32) * 255)
    g = gram_matrix(x)
    assert g.shape == (1, 3, 3)
    loss_fn = NSTLoss(style_weight=1.0, content_weight=1.0)
    val = float(loss_fn(x, x, x))
    np.testing.assert_allclose(val, 0.0, atol=1e-4)
    y = jnp.asarray(RNG.rand(1, 3, 32, 32).astype(np.float32) * 255)
    assert float(loss_fn(x, y, y)) > 0


# ----------------------------------------------------------------------------
# Legacy TF pickle conversion

def _tf_var_list_G(res=32, ch=64, num_ws=8, w_dim=32, nmap=2, img_ch=2):
    """Synthesize a plausible TF variable list for a small SG2 G."""
    v = [("dlatent_avg", RNG.randn(w_dim).astype(np.float32))]
    comp_mapping = []
    for i in range(nmap):
        comp_mapping.append((f"Dense{i}/weight", RNG.randn(w_dim, w_dim).astype(np.float32)))
        comp_mapping.append((f"Dense{i}/bias", RNG.randn(w_dim).astype(np.float32)))
    comp_syn = [("4x4/Const/const", RNG.randn(1, ch, 4, 4).astype(np.float32))]
    noise_idx = 0
    import math

    res_list = [4 * 2 ** i for i in range(int(math.log2(res // 4)) + 1)]
    for r in res_list:
        if r == 4:
            names = [("Conv", 0)]
        else:
            lg = int(math.log2(r))
            names = [("Conv0_up", lg * 2 - 5), ("Conv1", lg * 2 - 4)]
        for conv_name, nidx in names:
            comp_syn.append((f"{r}x{r}/{conv_name}/weight",
                             RNG.randn(3, 3, ch, ch).astype(np.float32)))
            comp_syn.append((f"{r}x{r}/{conv_name}/bias",
                             RNG.randn(ch).astype(np.float32)))
            comp_syn.append((f"{r}x{r}/{conv_name}/noise_strength",
                             np.float32(0.1)))
            comp_syn.append((f"{r}x{r}/{conv_name}/mod_weight",
                             RNG.randn(w_dim, ch).astype(np.float32)))
            comp_syn.append((f"{r}x{r}/{conv_name}/mod_bias",
                             RNG.randn(ch).astype(np.float32)))
            comp_syn.append((f"noise{nidx}",
                             RNG.randn(1, 1, r, r).astype(np.float32)))
        comp_syn.append((f"{r}x{r}/ToRGB/weight",
                         RNG.randn(1, 1, ch, img_ch).astype(np.float32)))
        comp_syn.append((f"{r}x{r}/ToRGB/bias", RNG.randn(img_ch).astype(np.float32)))
        comp_syn.append((f"{r}x{r}/ToRGB/mod_weight",
                         RNG.randn(w_dim, ch).astype(np.float32)))
        comp_syn.append((f"{r}x{r}/ToRGB/mod_bias", RNG.randn(ch).astype(np.float32)))
    return v, comp_mapping, comp_syn


def test_legacy_tf_generator_conversion():
    from latentaugment_tpu.models.stylegan2 import legacy, networks

    res, ch, w_dim, nmap = 32, 64, 32, 2
    v, comp_map, comp_syn = _tf_var_list_G(res=res, ch=ch, w_dim=w_dim, nmap=nmap)
    tf_G = legacy.TFNetworkStub(
        version=4,
        static_kwargs=dict(latent_size=w_dim, dlatent_size=w_dim,
                           resolution=res, num_channels=2,
                           fmap_base=ch * res // 2, fmap_max=ch,
                           mapping_layers=nmap, conv_clamp=256),
        variables=v,
        components={
            "mapping": legacy.TFNetworkStub(variables=comp_map, components={}),
            "synthesis": legacy.TFNetworkStub(variables=comp_syn, components={}),
        },
    )
    params, cfg = legacy.convert_tf_generator(tf_G)
    assert cfg.img_resolution == res
    z = jnp.asarray(RNG.randn(2, w_dim).astype(np.float32))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    img = networks.generator_apply(params, cfg, z)
    assert img.shape == (2, 2, res, res)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_legacy_tf_conditional_generator_conversion():
    """Conditional TF pickles (label_size > 0) must convert LabelEmbed into
    the mapping embed (reference legacy.py:173-174) and produce a tree the
    conditional mapping can actually apply (round-3 review: previously the
    embed was silently dropped and apply crashed on params['embed'])."""
    from latentaugment_tpu.models.stylegan2 import legacy, networks

    res, ch, w_dim, nmap, c_dim = 32, 64, 32, 2, 3
    v, comp_map, comp_syn = _tf_var_list_G(res=res, ch=ch, w_dim=w_dim,
                                           nmap=nmap)
    # Widen Dense0 input to z + embed and add the label embed variables.
    comp_map = [(n, val) for n, val in comp_map if not n.startswith("Dense0/")]
    comp_map += [
        ("Dense0/weight", RNG.randn(2 * w_dim, w_dim).astype(np.float32)),
        ("Dense0/bias", RNG.randn(w_dim).astype(np.float32)),
        ("LabelEmbed/weight", RNG.randn(c_dim, w_dim).astype(np.float32)),
        ("LabelEmbed/bias", RNG.randn(w_dim).astype(np.float32)),
    ]
    tf_G = legacy.TFNetworkStub(
        version=4,
        static_kwargs=dict(latent_size=w_dim, dlatent_size=w_dim,
                           resolution=res, num_channels=2, label_size=c_dim,
                           fmap_base=ch * res // 2, fmap_max=ch,
                           mapping_layers=nmap, conv_clamp=256),
        variables=v,
        components={
            "mapping": legacy.TFNetworkStub(variables=comp_map, components={}),
            "synthesis": legacy.TFNetworkStub(variables=comp_syn, components={}),
        },
    )
    params, cfg = legacy.convert_tf_generator(tf_G)
    assert cfg.c_dim == c_dim and cfg.embed_features == w_dim
    assert "embed" in params["mapping"]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    z = jnp.asarray(RNG.randn(2, w_dim).astype(np.float32))
    c = jnp.asarray(np.eye(c_dim, dtype=np.float32)[[0, 2]])
    img = networks.generator_apply(params, cfg, z, c=c)
    assert img.shape == (2, 2, res, res)
    assert bool(jnp.all(jnp.isfinite(img)))

    # A conditional pickle WITHOUT the embed vars must fail loudly.
    tf_bad = legacy.TFNetworkStub(
        version=4, static_kwargs=tf_G.static_kwargs, variables=v,
        components={
            "mapping": legacy.TFNetworkStub(
                variables=[(n, val) for n, val in comp_map
                           if "LabelEmbed" not in n], components={}),
            "synthesis": legacy.TFNetworkStub(variables=comp_syn,
                                              components={}),
        })
    with pytest.raises(ValueError, match="LabelEmbed"):
        legacy.convert_tf_generator(tf_bad)


# ----------------------------------------------------------------------------
# Data tools

def test_dataset_tool_pipeline(tmp_path):
    from latentaugment_tpu.data import dataset_tool

    # Build per-patient npy volumes: 2 modalities, square power-of-two.
    src = tmp_path / "vols"
    for p in range(3):
        pdir = src / f"patient{p:03d}"
        pdir.mkdir(parents=True)
        for mode in ("MR_nonrigid_CT", "MR_MR_T2"):
            np.save(pdir / f"{mode}.npy",
                    RNG.rand(24, 16, 16).astype(np.float32) * 300)

    # Normalize.
    norm = tmp_path / "norm"
    from click.testing import CliRunner

    runner = CliRunner()
    r = runner.invoke(dataset_tool.main, [
        "process-normalized", "--source", str(src), "--dest", str(norm)])
    assert r.exit_code == 0, r.output
    vol = np.load(norm / "patient000" / "MR_nonrigid_CT.npy")
    assert vol.min() >= 0 and vol.max() <= 255

    # Slice -> pickles (pop_range trims 10 both ends -> 4 slices/patient).
    dest = tmp_path / "out"
    temp = dataset_tool.snap_pickle(str(norm), str(dest), pop_range=10,
                                    sanity_check_prob=0)
    slices = [f for p in os.listdir(temp)
              for f in os.listdir(os.path.join(temp, p))]
    assert len(slices) == 3 * 4

    # Splits + zip.
    splits = dataset_tool.make_splits(
        [f"patient{p:03d}" for p in range(3)], train=0.34, val=0.33, test=0.33)
    assert sum(len(v) for v in splits.values()) == 3
    zpath = tmp_path / "data.zip"
    dataset_tool.snap_zip(temp, str(zpath), splits)
    with zipfile.ZipFile(zpath) as zf:
        names = zf.namelist()
        assert len(names) == 12
        assert all(n.split("/")[0] in ("train", "val", "test") for n in names)
        with zf.open(names[0]) as f:
            d = pickle.load(f)
        assert set(d) == {"MR_nonrigid_CT", "MR_MR_T2"}

    # CV splits
    cv = dataset_tool.make_cv_splits([f"p{i}" for i in range(10)], n_folds=5)
    assert len(cv) == 5
    for fold in cv:
        assert len(fold["train"]) + len(fold["val"]) + len(fold["test"]) == 10


def test_write_tozip(tmp_path):
    from latentaugment_tpu.data.write_tozip import write_to_zip

    src = tmp_path / "latents"
    for p in ("pa", "pb"):
        (src / p).mkdir(parents=True)
        for s in range(2):
            with open(src / p / f"{p}_{s:05d}.pickle", "wb") as f:
                pickle.dump(RNG.randn(8, 32).astype(np.float32), f)
    out = tmp_path / "w.zip"
    write_to_zip(str(src), str(out), splits_map={"pa": "train", "pb": "val"})
    with zipfile.ZipFile(out) as zf:
        names = sorted(zf.namelist())
        assert names[0].startswith("train/pa/")
        assert names[-1].startswith("val/pb/")


def test_create_csv_mayoclinic(tmp_path):
    from latentaugment_tpu.data.create_csv_mayoclinic import create_annotation_file

    root = tmp_path / "mayo"
    for p in ("L001", "L002", "L003"):
        for dom in ("LD", "HD"):
            d = root / p / dom
            d.mkdir(parents=True)
            for s in range(2):
                np.save(d / f"slice{s}.npy", RNG.rand(4, 4))
    outs = create_annotation_file(str(root), str(tmp_path / "csv"),
                                  train=0.34, val=0.33, test=0.33)
    import pandas as pd

    total = sum(len(pd.read_csv(v)) for v in outs.values())
    assert total == 3 * 2 * 2


# ----------------------------------------------------------------------------
# Misc utils

def test_infinite_sampler_rank_partition():
    from latentaugment_tpu.utils.util_misc import InfiniteSampler

    it0 = iter(InfiniteSampler(10, rank=0, num_replicas=2, shuffle=False))
    it1 = iter(InfiniteSampler(10, rank=1, num_replicas=2, shuffle=False))
    a = [next(it0) for _ in range(5)]
    b = [next(it1) for _ in range(5)]
    assert set(a).isdisjoint(set())  # sanity
    assert a == [0, 2, 4, 6, 8]
    assert b == [1, 3, 5, 7, 9]


def test_assert_shape():
    from latentaugment_tpu.utils.util_misc import assert_shape

    x = jnp.zeros((2, 3, 4))
    assert_shape(x, [2, None, 4])
    with pytest.raises(AssertionError):
        assert_shape(x, [2, 3, 5])
    with pytest.raises(AssertionError):
        assert_shape(x, [2, 3])


def test_copy_params_and_buffers():
    from latentaugment_tpu.utils.util_misc import copy_params_and_buffers

    src = {"a": {"w": np.ones((2, 2))}, "extra": np.zeros(3)}
    dst = {"a": {"w": np.zeros((2, 2)), "b": np.zeros(2)}}
    out = copy_params_and_buffers(src, dst)
    np.testing.assert_array_equal(np.asarray(out["a"]["w"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["a"]["b"]), 0.0)


def test_param_summary(capsys):
    from latentaugment_tpu.utils.util_misc import print_param_summary

    total = print_param_summary({"a": {"w": np.zeros((3, 4))}, "b": np.zeros(5)})
    assert total == 17


# ----------------------------------------------------------------------------
# Training stats

def test_training_stats_collector():
    from latentaugment_tpu.parallel import stats

    stats.report("test/loss", np.array([1.0, 2.0, 3.0]))
    c = stats.Collector(regex="test/.*")
    stats.report("test/loss", np.array([5.0]))
    c.update()
    assert c.num("test/loss") == 1
    assert c.mean("test/loss") == 5.0
    stats.report("test/loss", np.array([1.0, 3.0]))
    c.update()
    np.testing.assert_allclose(c.mean("test/loss"), 2.0)
    np.testing.assert_allclose(c.std("test/loss"), 1.0)


# ----------------------------------------------------------------------------
# HPO

def test_simple_study_optimize(tmp_path):
    from latentaugment_tpu.analysis.hpo import SimpleStudy

    study = SimpleStudy(seed=0)

    def obj(trial):
        x = trial.suggest_categorical("x", [1, 2, 3, 4])
        return -abs(x - 3)

    study.optimize(obj, n_trials=20)
    assert study.best_params["x"] == 3
    df = study.trials_dataframe()
    assert len(df) == 20
    path = tmp_path / "study.pkl"
    study.save(path)
    again = SimpleStudy.load(path)
    assert again.best_params == study.best_params


# ----------------------------------------------------------------------------
# SG2 training dataset

def test_custom_image_folder_dataset(tmp_path):
    from latentaugment_tpu.models.stylegan2.dataset import CustomImageFolderDataset

    zpath = tmp_path / "ds.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for p in range(2):
            for s in range(4):
                d = {"A": RNG.rand(16, 16).astype(np.float32),
                     "B": RNG.rand(16, 16).astype(np.float32)}
                buf = io.BytesIO()
                pickle.dump(d, buf)
                zf.writestr(f"train/p{p}/train_p{p}_{s:05d}.pickle",
                            buf.getvalue())
    ds = CustomImageFolderDataset(str(zpath), modalities=["A", "B"],
                                  split="train", resolution=16)
    assert len(ds) == 8
    img, label = ds[0]
    assert img.shape == (2, 16, 16)
    assert label.shape == (0,)
    assert ds.resolution == 16
    # xflip doubling
    ds2 = CustomImageFolderDataset(str(zpath), modalities=["A", "B"],
                                   split="train", xflip=True)
    assert len(ds2) == 16
    img_f, _ = ds2[8]
    np.testing.assert_allclose(img_f, ds2[0][0][:, :, ::-1])
    # perc_size subsetting
    ds3 = CustomImageFolderDataset(str(zpath), modalities=["A", "B"],
                                   split="train", perc_size=0.5)
    assert len(ds3) == 4


# ----------------------------------------------------------------------------
# Analysis plumbing

def test_umap_fallback_and_reports(tmp_path):
    from latentaugment_tpu.analysis.umap_analysis import manifold_coverage

    inv = RNG.randn(40, 8, 16).astype(np.float32)
    aug = RNG.randn(10, 8, 16).astype(np.float32)
    out, pts, labels = manifold_coverage(
        inv, {"LatentAugment": aug}, str(tmp_path / "cov.png"))
    assert os.path.isfile(out)
    assert pts.shape == (50, 2)


def test_create_gif(tmp_path):
    from PIL import Image

    from latentaugment_tpu.analysis.create_gif import create_gif

    for e in range(3):
        Image.new("L", (16, 16), color=e * 40).save(tmp_path / f"case_{e}.png")
    outs = create_gif(str(tmp_path))
    assert len(outs) == 1 and outs[0].endswith("case.gif")
    assert os.path.isfile(outs[0])


def test_pr_analysis_jsonl(tmp_path):
    import json

    from latentaugment_tpu.analysis.pr_analysis import (
        load_metric_jsonl, precision_recall_scatter)

    rec = {"exp1": [{"metric": "pr50k3_full", "mode": "A",
                     "value": {"pr50k3_full_precision": 0.8,
                               "pr50k3_full_recall": 0.6}}]}
    rec2 = {"exp2": [{"metric": "pr50k3_full", "mode": "B",
                      "value": {"pr50k3_full_precision": 0.7,
                                "pr50k3_full_recall": 0.5}}]}
    # Two concatenated pretty-printed objects in one file: regression for
    # the raw_decode index bug that dropped every record after the first.
    with open(tmp_path / "metric-exp1.jsonl", "w") as f:
        f.write(json.dumps(rec, indent=3) + "\n")
        f.write(json.dumps(rec2, indent=3) + "\n")
    df = load_metric_jsonl(str(tmp_path))
    assert len(df) == 2
    out = precision_recall_scatter(df, str(tmp_path / "pr.png"))
    assert os.path.isfile(out)


def test_parse_experiment_name_scientific():
    """'-' inside sci-notation values stays in the value; '-' elsewhere
    separates keys (regression: opt_lr_3e-05 truncated to '3e')."""
    from latentaugment_tpu.analysis.sg2_metrics_analysis import (
        parse_experiment_name)

    name = ("00001-n_imgs_4096-opt_lr_3e-05-w_pix_0.1-w_lpips_1.0"
            "-horizontal_flip_True")
    out = parse_experiment_name(name)
    assert out["opt_lr"] == "3e-05"
    assert out["n_imgs"] == "4096"
    assert out["w_pix"] == "0.1"
    assert out["w_lpips"] == "1.0"
    assert out["horizontal_flip"] == "True"

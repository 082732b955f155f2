"""Metric-layer tests: FID math, kNN PR math, FeatureStats, full calc_metric."""

import os
import pickle

import numpy as np
import pytest

from latentaugment_tpu.metrics import (
    FeatureStats, calc_metric, is_valid_metric, list_valid_metrics,
    report_metric,
)
from latentaugment_tpu.metrics.frechet_inception_distance import fid_from_moments
from latentaugment_tpu.metrics.precision_recall import (
    compute_distances, knn_precision_recall,
)

RNG = np.random.RandomState(7)


def test_feature_stats_mean_cov():
    stats = FeatureStats(capture_mean_cov=True, max_items=100)
    X = RNG.randn(100, 16).astype(np.float32)
    for lo in range(0, 100, 32):
        stats.append(X[lo:lo + 32])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, X.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(X.T, bias=True), atol=1e-4)


def test_feature_stats_max_items_and_capture_all():
    stats = FeatureStats(capture_all=True, max_items=10)
    stats.append(RNG.randn(7, 4).astype(np.float32))
    stats.append(RNG.randn(7, 4).astype(np.float32))
    assert stats.num_items == 10
    assert stats.get_all().shape == (10, 4)
    assert stats.is_full()


def test_fid_identical_distributions_is_zero():
    mu = RNG.randn(8)
    A = RNG.randn(8, 8)
    sigma = A @ A.T + np.eye(8)
    assert abs(fid_from_moments(mu, sigma, mu, sigma)) < 1e-6


def test_fid_known_value_diagonal():
    # For diagonal covariances: FID = |mu1-mu2|^2 + sum (s1 + s2 - 2 sqrt(s1 s2))
    mu1 = np.zeros(4)
    mu2 = np.ones(4)
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([2.0, 2.0, 2.0, 2.0])
    expect = 4.0 + sum(a + b - 2 * np.sqrt(a * b)
                       for a, b in zip([1, 2, 3, 4], [2, 2, 2, 2]))
    got = fid_from_moments(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_compute_distances_matches_cdist():
    rows = RNG.randn(13, 6).astype(np.float32)
    cols = RNG.randn(27, 6).astype(np.float32)
    got = compute_distances(rows, cols, col_batch_size=10)
    expect = np.sqrt(((rows[:, None] - cols[None]) ** 2).sum(-1))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-4)


def test_knn_pr_identical_sets():
    feats = RNG.randn(50, 8).astype(np.float32)
    p, r = knn_precision_recall(feats, feats, nhood_size=3,
                                row_batch_size=20, col_batch_size=20)
    assert p == 1.0 and r == 1.0


def test_knn_pr_disjoint_sets():
    real = RNG.randn(60, 8).astype(np.float32)
    gen = RNG.randn(60, 8).astype(np.float32) + 100.0  # far away
    p, r = knn_precision_recall(real, gen, nhood_size=3,
                                row_batch_size=30, col_batch_size=30)
    assert p == 0.0 and r == 0.0


def test_registry():
    assert is_valid_metric("fid50k_full")
    assert is_valid_metric("pr50k3_full")
    assert "fid50k_full" in list_valid_metrics()


@pytest.fixture(scope="module")
def metric_ws(tmp_path_factory):
    """Image zip + dumped augmented pickles for the full metric path."""
    from synthetic import build_workspace

    root = tmp_path_factory.mktemp("metrics")
    ws = build_workspace(root)
    # Dump fake augmented batches in the backbone format.
    aug_dir = os.path.join(str(root), "dumps")
    os.makedirs(os.path.join(aug_dir, "img_aug"), exist_ok=True)
    for i in range(4):
        batch = {
            "A": RNG.rand(2, 1, 32, 32).astype(np.float32) * 2 - 1,
            "B": RNG.rand(2, 1, 32, 32).astype(np.float32) * 2 - 1,
        }
        with open(os.path.join(aug_dir, "img_aug", f"img_aug_{i}"), "wb") as f:
            pickle.dump(batch, f)
    ws["aug_dir"] = aug_dir
    return ws


@pytest.mark.slow  # 30-60 s on the one-core box (round-4 fast-lane diet)
def test_calc_metric_fid_end_to_end(metric_ws, tmp_path):
    os.environ["LATENTAUGMENT_CACHE_DIR"] = str(tmp_path / "cache")
    result = calc_metric(
        "fid50k_full",
        dataset_kwargs=dict(path=metric_ws["img_zip"], split="train",
                            modalities=["MR_nonrigid_CT", "MR_MR_T2"],
                            resolution=32),
        dataset_kwargs_gen=dict(dataroot=metric_ws["aug_dir"],
                                aug_name="synth_aug", batch_size=2),
        mode_dict=dict(mode_name="MR_nonrigid_CT", mode_idx=0),
    )
    assert "fid50k_full" in result.results
    assert np.isfinite(result.results.fid50k_full)
    assert result.results.fid50k_full > 0
    report_metric(result, mode="MR_nonrigid_CT", run_dir=str(tmp_path))
    assert os.path.isfile(tmp_path / "metric-MR_nonrigid_CT-fid50k_full.jsonl")


@pytest.mark.slow  # >60 s measured on the one-core box (round-4 fast-lane diet)
def test_sg2_metrics_analysis_sweep(metric_ws, tmp_path):
    """The metric sweep driver (analysis/sg2_metrics_analysis.py; ref
    analysis/sg2_metrics_analysis.py:76-130): discovers experiment dirs
    by pattern (skipping dirs without img_aug), scores each modality,
    recovers the name-encoded config (incl. the scientific-notation '-'
    case), and writes metric-<exp>.jsonl per experiment."""
    import shutil

    from latentaugment_tpu.analysis import sg2_metrics_analysis as sma

    os.environ["LATENTAUGMENT_CACHE_DIR"] = str(tmp_path / "cache")
    run_dir = tmp_path / "runs"
    exp = "aug_n_imgs_8-opt_lr_3e-05-w_lpips_10.0-opt_num_epochs_6"
    shutil.copytree(os.path.join(metric_ws["aug_dir"], "img_aug"),
                    run_dir / exp / "img_aug")
    (run_dir / "not_an_experiment").mkdir()  # no img_aug -> skipped

    res = sma.sweep(str(run_dir), pattern="n_imgs",
                    dataset_zip=metric_ws["img_zip"],
                    modalities="MR_nonrigid_CT,MR_MR_T2", resolution=32,
                    split="train", batch_size=2,
                    metrics=("fid50k_full",))
    assert list(res) == [exp]
    entries = res[exp]
    assert {e["mode"] for e in entries} == {"MR_nonrigid_CT", "MR_MR_T2"}
    for e in entries:
        assert np.isfinite(e["value"]["fid50k_full"])
        assert e["params"]["n_imgs"] == "8"
        assert e["params"]["opt_lr"] == "3e-05"
        assert e["params"]["w_lpips"] == "10.0"
        assert e["params"]["opt_num_epochs"] == "6"
    assert (run_dir / f"metric-{exp}.jsonl").is_file()


@pytest.mark.slow  # >60 s measured on the one-core box (round-4 fast-lane diet)
def test_calc_metric_pr_end_to_end(metric_ws, tmp_path):
    os.environ["LATENTAUGMENT_CACHE_DIR"] = str(tmp_path / "cache")
    result = calc_metric(
        "pr50k3_full",
        dataset_kwargs=dict(path=metric_ws["img_zip"], split="train",
                            modalities=["MR_nonrigid_CT", "MR_MR_T2"],
                            resolution=32),
        dataset_kwargs_gen=dict(dataroot=metric_ws["aug_dir"],
                                aug_name="synth_aug", batch_size=2),
        mode_dict=dict(mode_name="MR_nonrigid_CT", mode_idx=0),
    )
    p = result.results.pr50k3_full_precision
    r = result.results.pr50k3_full_recall
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0


@pytest.mark.slow
def test_calc_metric_fid_live_generator(metric_ws, tmp_path):
    os.environ["LATENTAUGMENT_CACHE_DIR"] = str(tmp_path / "cache2")
    from latentaugment_tpu.models.stylegan2 import convert

    g_params, g_cfg, _, _ = convert.load_stylegan(metric_ws["ckpt"])
    import jax

    g_params = jax.tree_util.tree_map(np.asarray, g_params)
    from latentaugment_tpu.metrics import metric_utils
    from latentaugment_tpu.metrics.frechet_inception_distance import compute_fid

    opts = metric_utils.MetricOptions(
        G=(g_params, g_cfg),
        dataset_kwargs=dict(path=metric_ws["img_zip"], split="train",
                            modalities=["MR_nonrigid_CT", "MR_MR_T2"],
                            resolution=32),
        mode_dict=dict(mode_name="MR_nonrigid_CT", mode_idx=0),
    )
    fid = compute_fid(opts, max_real=None, num_gen=16)
    assert np.isfinite(fid)


# ---------------------------------------------------------------------------
# Mesh-sharded metrics (round-1 VERDICT #5: MetricOptions.mesh was dead
# plumbing; now detector batches and PR distance tiles shard over it).


@pytest.mark.slow
def test_sharded_detector_matches_single_device():
    from latentaugment_tpu.metrics import metric_utils
    from latentaugment_tpu.parallel import mesh as pmesh

    mesh = pmesh.get_mesh(8)
    det = metric_utils.get_feature_detector(
        "https://example.com/detectors/vgg16.pkl")
    x = np.random.RandomState(0).rand(11, 3, 32, 32).astype(np.float32) * 255
    # 11 rows: exercises the pad-to-multiple + trim path too.
    f_single = np.asarray(det(x))
    f_sharded = np.asarray(det(x, mesh=mesh))
    # NaN would make assert_allclose pass vacuously (equal_nan defaults on).
    assert np.isfinite(f_single).all()
    assert f_sharded.shape == f_single.shape
    np.testing.assert_allclose(f_sharded, f_single, rtol=2e-4, atol=2e-4)


def test_sharded_distance_tiles_match():
    from latentaugment_tpu.metrics import precision_recall as pr
    from latentaugment_tpu.parallel import mesh as pmesh

    mesh = pmesh.get_mesh(8)
    rs = np.random.RandomState(1)
    rows = rs.rand(13, 64).astype(np.float32)
    cols = rs.rand(21, 64).astype(np.float32)
    d_single = pr.compute_distances(rows, cols, col_batch_size=7)
    d_sharded = pr.compute_distances(rows, cols, col_batch_size=7, mesh=mesh)
    np.testing.assert_allclose(d_sharded, d_single, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sharded_fid_pr_match_single_device(metric_ws, tmp_path):
    """Full calc_metric with a mesh == without (cache disabled so both
    paths really extract features)."""
    from latentaugment_tpu.parallel import mesh as pmesh

    mesh = pmesh.get_mesh(8)
    common = dict(
        dataset_kwargs=dict(path=metric_ws["img_zip"], split="train",
                            modalities=["MR_nonrigid_CT", "MR_MR_T2"],
                            resolution=32),
        dataset_kwargs_gen=dict(dataroot=metric_ws["aug_dir"],
                                aug_name="synth_aug", batch_size=2),
        mode_dict=dict(mode_name="MR_nonrigid_CT", mode_idx=0),
        cache=False,
    )
    fid_single = calc_metric("fid50k_full", **common).results.fid50k_full
    fid_mesh = calc_metric("fid50k_full", mesh=mesh, **common) \
        .results.fid50k_full
    np.testing.assert_allclose(fid_mesh, fid_single, rtol=1e-3)

    pr_single = calc_metric("pr50k3_full", **common).results
    pr_mesh = calc_metric("pr50k3_full", mesh=mesh, **common).results
    assert pr_mesh.pr50k3_full_precision == pr_single.pr50k3_full_precision
    assert pr_mesh.pr50k3_full_recall == pr_single.pr50k3_full_recall

"""Regressions for the round-3 augments review: the p_thres gate's
latent contract, partial final batches, preprocess modes the reference's
own get_params rejected, val/test GeometricAugment, and manifold-cache
keying/stream independence."""

import glob
import os

import numpy as np
import pytest

from synthetic import RES, build_workspace

from latentaugment_tpu.augments import create_augment
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.options import AugOptions


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return build_workspace(tmp_path_factory.mktemp("wsgate"))


def _parse(ws, extra):
    return AugOptions().parse(argv=ws["argv"] + extra, install_logger=False)


def test_gate_skip_has_no_latents(ws):
    """p_thres=1.0 never augments: the output is the input, `augmented`
    is False, and latent accessors raise instead of returning the
    previous batch's stale latents (regression: the reference dumps
    stale w under the current fname, backbone_latentaug.py:107-119)."""
    opt = _parse(ws, ["--init_w", "inv", "--p_thres", "1.0",
                      "--w_pix", "0.1", "--w_lpips", "0.0",
                      "--w_latent", "0.001", "--w_disc", "0.01"])
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    batch = next(iter(dataset))
    augment.set_input(batch)
    augment.forward()
    assert augment.augmented is False
    out = augment.get_output()
    np.testing.assert_array_equal(out["A"], np.asarray(batch["A"]))
    with pytest.raises(RuntimeError, match="skipped"):
        augment.get_latent_output()
    with pytest.raises(RuntimeError, match="skipped"):
        augment.get_latent_input()


def test_partial_batch_pad_and_trim(ws):
    """A final partial batch is padded up to the compiled batch_size for
    the walk but trimmed back to len(fname) rows by every accessor
    (regression: np.empty tail rows flowed through uninitialized and
    get_output returned batch_size rows against a shorter fname list)."""
    opt = _parse(ws, ["--init_w", "inv", "--p_thres", "1.0",
                      "--batch_size", "5",
                      "--w_pix", "0.1", "--w_lpips", "0.0",
                      "--w_latent", "0.001", "--w_disc", "0.01"])
    dataset = create_dataset(opt)
    augment = create_augment(opt)

    # sample_from_inversion pads missing rows with the last real row.
    last = None
    for batch in dataset:
        last = batch
    assert len(last["A_paths"]) == 2  # 12 items % batch 5
    w = augment.sample_from_inversion(last["A_paths"])
    assert w.shape == (5, 1, augment.w_dim)
    np.testing.assert_array_equal(w[2], w[1])
    assert np.isfinite(w).all()

    # Accessors trim to the real row count (gate-skip path, no compile).
    augment.set_input(last)
    augment.forward()
    out = augment.get_output()
    assert out["A"].shape[0] == 2 and len(out["A_paths"]) == 2


@pytest.mark.slow
def test_partial_batch_walk(ws):
    """The compiled walk runs a padded partial batch end to end and the
    latent accessors return len(fname) rows."""
    # Batch 8 (even: the synthetic D's mbstd group is 2) over 12 items
    # -> final partial batch of 4.
    opt = _parse(ws, ["--init_w", "inv", "--p_thres", "0.0",
                      "--batch_size", "8", "--opt_num_epochs", "2",
                      "--w_pix", "0.1", "--w_lpips", "0.0",
                      "--w_latent", "0.001", "--w_disc", "0.01"])
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    last = None
    for batch in dataset:
        last = batch
    assert len(last["A_paths"]) == 4
    augment.set_input(last)
    augment.forward()
    assert augment.augmented is True
    out = augment.get_output()
    assert out["A"].shape[0] == 4
    assert np.isfinite(out["A"]).all() and np.isfinite(out["B"]).all()
    lat = augment.get_latent_output()
    assert np.asarray(lat["w"]).shape[0] == 4
    assert np.asarray(augment.get_latent_input()["w"]).shape[0] == 4


def test_get_params_accepts_all_advertised_modes():
    """--preprocess_aug center_crop/original no longer crash the first
    forward (the reference's get_params asserts them away even though its
    CLI advertises them, util_dataset.py:290)."""
    from latentaugment_tpu.augments import manifold

    for mode in ("center_crop", "original"):
        assert manifold.get_params(32, 16, mode) == {"crop_pos": (0, 0)}
    p = manifold.get_params(32, 16, "center_random_crop")
    hi = manifold.center_crop_size(32) - 16
    assert 0 <= p["crop_pos"][0] <= hi
    tf = manifold.get_transform(32, 16, "original")
    x = np.zeros((1, 1, 32, 32), dtype=np.float32)
    assert tf(x).shape == (1, 1, 32, 32)
    tf = manifold.get_transform(32, 16, "center_crop")
    assert tf(x).shape[-1] == manifold.center_crop_size(32)


def test_geometric_val_phase_noop(tmp_path):
    """Val/test GeometricAugment passes images through instead of
    crashing on the unset transform (the reference crashes:
    geometric_aug.py:52-58 never sets self.transform off-train)."""
    ws = build_workspace(tmp_path, split="val")
    argv = ["--dataroot", ws["img_zip"],
            "--checkpoints_dir", ws["checkpoints_dir"],
            "--dataset_mode", "pelvis", "--load_size", str(RES),
            "--batch_size", "2", "--aug", "geometric", "--phase", "val",
            "--name", "geo_val"]
    opt = AugOptions().parse(argv=argv, install_logger=False)
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    batch = next(iter(dataset))
    augment.set_input(batch)
    augment.forward()
    out = augment.get_output()
    np.testing.assert_array_equal(out["A"], np.asarray(batch["A"]))


def test_soft_aug_str2bool(ws):
    opt = _parse(ws, ["--soft_aug", "False", "--verbose_log", "0",
                      "--p_thres", "1.0"])
    assert opt.soft_aug is False and opt.verbose_log is False
    opt = _parse(ws, ["--soft_aug", "True", "--p_thres", "1.0"])
    assert opt.soft_aug is True


def test_cache_tags_carry_dataset_identity(ws):
    """Manifold cache filenames include the source dataset/split (and
    preprocess for features), so a different inversion experiment or
    split with the same item count cannot silently reuse a stale cache
    (the reference keys only on manifold/step/num_items,
    util_latent_aug.py:517-526)."""
    opt = _parse(ws, ["--init_w", "inv", "--p_thres", "1.0",
                      "--w_pix", "1.0", "--w_lpips", "1.0",
                      "--w_latent", "0.001", "--w_disc", "0.01"])
    augment = create_augment(opt)
    cache_dir = os.path.join(ws["interim"], ws["dataset"], "cache_dir")
    names = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(cache_dir, "*.pkl")))
    assert any(n.startswith(f"{ws['w_name']}-train-latent") for n in names)
    assert any(n.startswith(f"{ws['dataset_name']}-train-img") for n in names)
    feat = [n for n in names if "features_jit" in n]
    assert feat and all(ws["dataset_name"] in n and "-train-" in n
                        and "center_random_crop" in n for n in feat)
    del augment


def test_features_cache_modes_independent(ws):
    """Rebuilding ONE modality's feature manifold (its cache deleted,
    the other's present) reproduces the clean-build features — each
    modality's crop stream is seeded per cache tag, not drawn from one
    shared sequential stream (regression: a partial cache hit desynced
    later modes' crops)."""
    opt = _parse(ws, ["--init_w", "inv", "--p_thres", "1.0",
                      "--w_pix", "0.0", "--w_lpips", "1.0",
                      "--w_latent", "0.0", "--w_disc", "0.01"])
    augment = create_augment(opt)
    clean = [np.asarray(s[0]) for s in augment.latent_aug.fea_summaries]

    cache_dir = os.path.join(ws["interim"], ws["dataset"], "cache_dir")
    feat = sorted(glob.glob(os.path.join(cache_dir, "*features_jit*.pkl")))
    assert len(feat) == 2
    os.remove(feat[1])  # drop mode 1 only -> mode 0 hits its cache

    augment2 = create_augment(opt)
    rebuilt = [np.asarray(s[0]) for s in augment2.latent_aug.fea_summaries]
    for a, b in zip(clean, rebuilt):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)

"""Conditional metric path: generator feature stats draw labels from the
real dataset's distribution (parity: reference iterate_random_labels,
metric_utils.py:337-344) and fall back to uniform one-hot without labels.
"""

import io
import json
import pickle
import zipfile

import numpy as np
import pytest

import jax

from latentaugment_tpu.metrics import metric_utils
from latentaugment_tpu.models.stylegan2 import networks
import pytest

MODALITIES = ["A", "B"]


def _labeled_zip(path, n=8, res=16, c_dim=3, skew_class=1):
    """Image zip + dataset.json whose labels are all `skew_class`."""
    rng = np.random.RandomState(0)
    labels = {}
    with zipfile.ZipFile(str(path), "w") as zf:
        for i in range(n):
            name = f"train/p{i:03d}/train_p{i:03d}_00010.pickle"
            img = {m: rng.rand(res, res).astype(np.float32) * 255
                   for m in MODALITIES}
            buf = io.BytesIO()
            pickle.dump(img, buf)
            zf.writestr(name, buf.getvalue())
            labels[name] = skew_class
        zf.writestr("dataset.json", json.dumps({"labels": labels}))


def test_label_bank_reads_dataset_distribution(tmp_path):
    zpath = tmp_path / "set.zip"
    _labeled_zip(zpath, c_dim=3, skew_class=2)
    opts = metric_utils.MetricOptions(dataset_kwargs=dict(
        path=str(zpath), modalities=MODALITIES, split="train",
        use_labels=True))
    bank = metric_utils._dataset_label_bank(opts, c_dim=3)
    assert bank is not None and bank.shape == (8, 3)
    # Every drawn label is the dataset's (skewed) class, NOT uniform.
    np.testing.assert_array_equal(bank.argmax(1), np.full(8, 2))
    np.testing.assert_allclose(bank.sum(1), 1.0)


def test_label_bank_mismatch_raises(tmp_path):
    """use_labels=True is an explicit request: a label-schema mismatch must
    fail loudly (like an unreadable zip), not silently skew conditional FID
    via the uniform fallback. Without use_labels the bank is simply None."""
    zpath = tmp_path / "set.zip"
    _labeled_zip(zpath, c_dim=3)
    opts = metric_utils.MetricOptions(dataset_kwargs=dict(
        path=str(zpath), modalities=MODALITIES, split="train",
        use_labels=True))
    with pytest.raises(RuntimeError, match="do not match"):
        metric_utils._dataset_label_bank(opts, c_dim=7)
    opts2 = metric_utils.MetricOptions(dataset_kwargs=dict(
        path=str(zpath), modalities=MODALITIES, split="train"))
    assert metric_utils._dataset_label_bank(opts2, c_dim=3) is None


@pytest.mark.slow
def test_generator_stats_conditional(tmp_path):
    """Feature stats run end-to-end on a conditional G, labels drawn from
    the labeled dataset."""
    zpath = tmp_path / "set.zip"
    _labeled_zip(zpath, c_dim=3, skew_class=2)
    g_cfg = networks.generator_config(
        z_dim=16, c_dim=3, w_dim=16, img_resolution=32, img_channels=2,
        channel_base=512, channel_max=32, num_mapping_layers=2)
    g_params = networks.generator_init(jax.random.PRNGKey(0), g_cfg)
    opts = metric_utils.MetricOptions(
        G=(g_params, g_cfg),
        dataset_kwargs=dict(path=str(zpath), modalities=MODALITIES,
                            split="train", use_labels=True),
        mode_dict=dict(mode_name="A", mode_idx=0), cache=False)
    stats = metric_utils.compute_feature_stats_for_generator(
        opts, "https://nvlabs-fi-cdn.nvidia.com/stylegan2-ada-pytorch/"
        "pretrained/metrics/vgg16.pt",
        capture_mean_cov=True, max_items=8, batch_size=8)
    mu, cov = stats.get_mean_cov()
    assert np.isfinite(mu).all() and np.isfinite(cov).all()

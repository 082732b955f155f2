"""Seed discipline: same seed -> identical augmentation streams."""

import numpy as np
import pytest

from latentaugment_tpu.options import AugOptions
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.augments import create_augment

from synthetic import build_workspace


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return build_workspace(tmp_path_factory.mktemp("ws_det"))


def _run_once(ws, seed, name):
    opt = AugOptions().parse(
        argv=ws["argv"] + ["--init_w", "inv", "--p_thres", "0.0",
                           "--seed", str(seed), "--name", name,
                           "--w_pix", "0.1", "--w_lpips", "0.5",
                           "--w_latent", "0.001", "--w_disc", "0.01"],
        install_logger=False)
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    outs = []
    for i, batch in enumerate(dataset):
        if i >= 2:
            break
        augment.set_input(batch)
        augment.forward()
        outs.append(augment.get_output()["A"])
    return np.concatenate(outs)


@pytest.mark.slow
def test_same_seed_same_stream(ws):
    a = _run_once(ws, 7, "det_a")
    b = _run_once(ws, 7, "det_b")
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_different_seed_different_stream(ws):
    a = _run_once(ws, 7, "det_c")
    b = _run_once(ws, 8, "det_d")
    assert not np.array_equal(a, b)

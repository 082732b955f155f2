"""Mesh-enabled policy path: full LatentAugment over the 8-device CPU mesh."""

import numpy as np
import pytest

from latentaugment_tpu.options import AugOptions
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.augments import create_augment

from synthetic import RES, build_workspace


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return build_workspace(tmp_path_factory.mktemp("ws_mesh"))


@pytest.mark.slow
def test_policy_with_mesh(ws):
    argv = list(ws["argv"])
    argv[argv.index("--batch_size") + 1] = "8"  # divisible by 8 devices
    opt = AugOptions().parse(
        argv=argv + ["--init_w", "inv", "--p_thres", "0.0",
                     "--n_mesh_devices", "8",
                     "--w_pix", "0.1", "--w_lpips", "0.0",
                     "--w_latent", "0.001", "--w_disc", "0.01"],
        install_logger=False)
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    assert augment.latent_aug.mesh is not None

    batch = next(iter(dataset))
    augment.set_input(batch)
    augment.forward()
    out = augment.get_output()
    assert out["A"].shape == (8, 1, RES, RES)
    assert np.isfinite(out["A"]).all()
    # Latents moved and outputs differ from inputs.
    w_in = augment.get_latent_input()
    w_out = augment.get_latent_output()
    assert not np.allclose(w_in["w"], w_out["w"])


def test_prefetch_loader_orders_batches(ws):
    opt = AugOptions().parse(argv=ws["argv"] + ["--serial_batches"],
                             install_logger=False)
    dataset = create_dataset(opt)
    paths_prefetch = [tuple(b["A_paths"]) for b in dataset]
    dataset.prefetch = 0
    paths_serial = [tuple(b["A_paths"]) for b in dataset]
    assert paths_prefetch == paths_serial
    assert len(paths_serial) == 6  # 12 items / batch 2

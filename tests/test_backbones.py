"""Smoke tests: the backbone driver scripts run as real CLIs."""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

from synthetic import build_workspace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, argv, n_imgs=4):
    env = dict(os.environ)
    env["LATENTAUGMENT_N_IMGS"] = str(n_imgs)
    env["JAX_PLATFORMS"] = "cpu"
    # Force CPU despite the axon sitecustomize (it honors jax.config only,
    # so route through a -c wrapper that sets it before the script runs).
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = ['{script}'] + {argv!r};"
        f"import runpy; runpy.run_path('{os.path.join(REPO, script)}',"
        "run_name='__main__')"
    )
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=540)


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    return build_workspace(tmp_path_factory.mktemp("ws_bb"))


def test_backbone_geoaug_cli(ws):
    argv = [
        "--dataroot", ws["img_zip"],
        "--checkpoints_dir", ws["checkpoints_dir"],
        "--dataset_mode", "pelvis", "--load_size", "32",
        "--batch_size", "2", "--aug", "geometric",
        "--horizontal_flip", "--affine",
        "--name", "geo_cli",
    ]
    res = _run("backbone_geoaug.py", argv)
    assert res.returncode == 0, res.stderr[-2000:]
    out_dirs = [d for d in os.listdir(ws["checkpoints_dir"]) if "geo_cli" in d]
    assert out_dirs
    img_aug = os.path.join(ws["checkpoints_dir"], out_dirs[0], "img_aug")
    dumps = os.listdir(img_aug)
    assert len(dumps) == 2  # n_imgs 4 / batch 2
    with open(os.path.join(img_aug, dumps[0]), "rb") as f:
        batch = pickle.load(f)
    assert np.asarray(batch["A"]).shape == (2, 1, 32, 32)


def test_backbone_sg2aug_cli(ws):
    argv = ws["argv"] + ["--rand_aug", "--name", "sg2_cli"]
    res = _run("backbone_sg2aug.py", argv)
    assert res.returncode == 0, res.stderr[-2000:]
    out_dirs = [d for d in os.listdir(ws["checkpoints_dir"]) if "sg2_cli" in d]
    assert out_dirs
    latent_aug = os.path.join(ws["checkpoints_dir"], out_dirs[0], "latent_aug")
    assert len(os.listdir(latent_aug)) == 2

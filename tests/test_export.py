"""StableHLO serving export (scripts/export_model.py).

The artifact must round-trip: serialize with weights baked in,
deserialize WITHOUT any model code, and reproduce the in-framework
forward. The reference's deployment unit is a persistence pickle that
re-executes embedded Python source at load time
(/root/reference/models/stylegan3/torch_utils/persistence.py) — the
export path replaces that with a self-contained compiler artifact.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import export as jexport

from latentaugment_tpu.models.stylegan2 import convert, networks
from scripts.export_model import main as export_main
from synthetic import make_checkpoint, RES


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("export")
    path = str(d / "ckpt.pkl")
    make_checkpoint(path)
    return path


@pytest.mark.slow  # 30-60 s on the one-core box (round-4 fast-lane diet)
def test_generator_export_symbolic_batch_roundtrip(ckpt, tmp_path):
    out = str(tmp_path / "g.shlo")
    export_main(["--checkpoint", ckpt, "--out", out])
    gp, gc, _, _ = convert.load_stylegan(ckpt)
    g = jexport.deserialize(open(out, "rb").read())
    assert "cpu" in g.platforms and "tpu" in g.platforms
    # One artifact, several batch sizes (symbolic leading dim).
    for b in (1, 3):
        z = np.random.RandomState(b).randn(b, gc.z_dim).astype(np.float32)
        got = np.asarray(g.call(z))
        ref = np.asarray(networks.generator_apply(
            gp, gc, jnp.asarray(z), noise_mode="const"))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_generator_export_bakes_truncation(ckpt, tmp_path):
    out = str(tmp_path / "g_trunc.shlo")
    export_main(["--checkpoint", ckpt, "--out", out,
                 "--truncation", "0.5"])
    gp, gc, _, _ = convert.load_stylegan(ckpt)
    g = jexport.deserialize(open(out, "rb").read())
    z = np.random.RandomState(0).randn(2, gc.z_dim).astype(np.float32)
    got = np.asarray(g.call(z))
    ref = np.asarray(networks.generator_apply(
        gp, gc, jnp.asarray(z), truncation_psi=0.5, noise_mode="const"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    full = np.asarray(networks.generator_apply(
        gp, gc, jnp.asarray(z), noise_mode="const"))
    assert np.abs(got - full).max() > 1e-4  # psi actually baked in


def test_discriminator_export_concrete_batch(ckpt, tmp_path):
    out = str(tmp_path / "d.shlo")
    export_main(["--checkpoint", ckpt, "--out", out, "--which", "d",
                 "--batch", "4"])
    _, _, dp, dc = convert.load_stylegan(ckpt)
    d = jexport.deserialize(open(out, "rb").read())
    img = np.random.RandomState(9).rand(
        4, dc.img_channels, RES, RES).astype(np.float32) * 2 - 1
    got = np.asarray(d.call(img))
    ref = np.asarray(networks.discriminator_apply(dp, dc,
                                                  jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_discriminator_export_requires_batch(ckpt, tmp_path):
    with pytest.raises(ValueError, match="concrete"):
        export_main(["--checkpoint", ckpt,
                     "--out", str(tmp_path / "d.shlo"), "--which", "d"])


def test_conditional_generator_export(tmp_path):
    ckpt = str(tmp_path / "ckpt_cond.pkl")
    make_checkpoint(ckpt, c_dim=2)
    out = str(tmp_path / "gc.shlo")
    export_main(["--checkpoint", ckpt, "--out", out])
    gp, gc, _, _ = convert.load_stylegan(ckpt)
    assert gc.c_dim == 2
    g = jexport.deserialize(open(out, "rb").read())
    z = np.random.RandomState(1).randn(3, gc.z_dim).astype(np.float32)
    c = np.eye(2, dtype=np.float32)[[0, 1, 0]]
    got = np.asarray(g.call(z, c))
    ref = np.asarray(networks.generator_apply(
        gp, gc, jnp.asarray(z), c=jnp.asarray(c), noise_mode="const"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # Labels must matter through the exported artifact too.
    got_swapped = np.asarray(g.call(z, np.eye(2, dtype=np.float32)[[1, 0, 1]]))
    assert np.abs(got - got_swapped).max() > 1e-4

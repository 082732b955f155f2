"""TPU-native W-space projector (models/stylegan2/projector.py).

The reference defers inversion to NVIDIA's external projector.py
(reference README.md:62-63) and only packages its outputs
(write_tozip.py:81); these tests pin our native replacement end to end:
descent semantics, target recovery, the CLI's zip layout, and mesh
sharding.
"""

import os
import pickle
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from synthetic import MODALITIES, RES, make_image_zip
from latentaugment_tpu.models import vgg
from latentaugment_tpu.models.stylegan2 import networks, projector
from latentaugment_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def tiny():
    g_cfg = networks.generator_config(
        z_dim=32, w_dim=32, img_resolution=RES, img_channels=2,
        channel_base=512, channel_max=64, num_mapping_layers=2)
    g_params = networks.generator_init(jax.random.PRNGKey(0), g_cfg)
    vgg_params = vgg.get_vgg16()  # seeded random init (no egress)
    return g_cfg, g_params, vgg_params


def test_w_stats_shapes_and_spread(tiny):
    g_cfg, g_params, _ = tiny
    w_avg, w_std = projector.w_stats(g_params["mapping"], g_cfg,
                                     jax.random.PRNGKey(1), n_samples=256)
    assert w_avg.shape == (1, 1, g_cfg.w_dim)
    assert float(w_std) > 0.0
    # Definition: root of total squared deviation per sample (NVIDIA's
    # projector convention), not a per-coordinate std.
    zk, _ = jax.random.split(jax.random.PRNGKey(1))  # w_stats' internal split
    z = jax.random.normal(zk, (256, g_cfg.z_dim))
    w = networks.mapping_apply(g_params["mapping"], g_cfg, z, broadcast=False)
    expect = np.sqrt(np.sum((np.asarray(w) - np.asarray(w_avg[0])) ** 2) / 256)
    assert np.isclose(float(w_std), expect, rtol=1e-4)


@pytest.mark.slow
def test_projection_descends_and_recovers(tiny):
    g_cfg, g_params, vgg_params = tiny
    key = jax.random.PRNGKey(2)
    w_avg, w_std = projector.w_stats(g_params["mapping"], g_cfg, key,
                                     n_samples=256)

    # A reachable target: synthesize from a real mapped w.
    z_true = jax.random.normal(jax.random.PRNGKey(3), (2, g_cfg.z_dim))
    w_true = networks.mapping_apply(g_params["mapping"], g_cfg, z_true,
                                    broadcast=False)[:, None, :]
    target = networks.synthesis_apply(
        g_params["synthesis"], g_cfg, jnp.repeat(w_true, g_cfg.num_ws, axis=1))

    project = jax.jit(projector.make_project_fn(
        g_cfg, num_steps=60, pix_weight=1.0))
    w_opt, dists = project(g_params, vgg_params, target, w_avg, w_std,
                           jax.random.PRNGKey(4))
    dists = np.asarray(dists)
    assert w_opt.shape == (2, 1, g_cfg.w_dim)
    assert dists[-1] < 0.5 * dists[0], f"no descent: {dists[0]} -> {dists[-1]}"

    # The projected image must beat the w_avg starting point by a wide
    # margin in pixel space.
    def img(w):
        return networks.synthesis_apply(
            g_params["synthesis"], g_cfg, jnp.repeat(w, g_cfg.num_ws, axis=1))

    mse_opt = float(jnp.mean((img(w_opt) - target) ** 2))
    w0 = jnp.broadcast_to(w_avg, (2, 1, g_cfg.w_dim))
    mse_avg = float(jnp.mean((img(w0) - target) ** 2))
    assert mse_opt < 0.3 * mse_avg, (mse_opt, mse_avg)


@pytest.mark.slow  # >60 s measured on the one-core box (round-4 fast-lane diet)
def test_project_cli_writes_policy_consumable_zip(tiny, tmp_path):
    from scripts.project_dataset import main as project_main
    from latentaugment_tpu.augments import manifold
    from latentaugment_tpu.models.stylegan2 import convert

    g_cfg, g_params, _ = tiny
    ckpt = os.path.join(tmp_path, "ckpt.pkl")
    convert.save_checkpoint(ckpt, g_params, g_cfg, None, None)
    img_zip = os.path.join(tmp_path, "imgs.zip")
    fnames = make_image_zip(img_zip, n_patients=2, slices_per_patient=2)

    outdir = os.path.join(tmp_path, "temp-projector")
    dest_zip = os.path.join(tmp_path, "inv.zip")
    project_main([
        "--checkpoint", ckpt, "--data_zip", img_zip,
        "--split", "train", "--modalities", ",".join(MODALITIES),
        "--resolution", str(RES), "--num_steps", "6", "--batch_size", "3",
        "--w_avg_samples", "64", "--outdir", outdir, "--dest_zip", dest_zip,
    ])

    # Zip layout matches the image zip member-for-member (the policy looks
    # w up by the image fname).
    with zipfile.ZipFile(dest_zip) as zf:
        members = sorted(n for n in zf.namelist() if n.endswith(".pickle"))
    assert members == sorted(fnames)

    # Consumable by the policy-side dataset with lossless reverse
    # broadcasting ([num_ws, w_dim], all rows equal).
    ds = manifold.LatentCodeDataset(dest_zip, split="train",
                                    w_dim=g_cfg.w_dim, num_ws=g_cfg.num_ws)
    w0, _ = ds[0]
    assert w0.shape == (g_cfg.num_ws, g_cfg.w_dim)
    assert np.allclose(w0, w0[0:1])

    # Direct sample_from_inversion shape contract (pickle payload loads
    # into a [num_ws, w_dim] row of the policy's batch buffer).
    with zipfile.ZipFile(dest_zip) as zf, zf.open(members[0]) as f:
        payload = pickle.load(f)
    assert np.asarray(payload).shape == (g_cfg.num_ws, g_cfg.w_dim)


@pytest.mark.slow
def test_projection_sharded_equals_single(tiny):
    g_cfg, g_params, vgg_params = tiny
    if jax.device_count() < 4:
        pytest.skip("needs the virtual multi-device CPU mesh")
    key = jax.random.PRNGKey(5)
    w_avg, w_std = projector.w_stats(g_params["mapping"], g_cfg, key,
                                     n_samples=64)
    target = jax.random.uniform(jax.random.PRNGKey(6), (4, 2, RES, RES),
                                minval=-1.0, maxval=1.0)
    fn = projector.make_project_fn(g_cfg, num_steps=4)

    single = jax.jit(fn)(g_params, vgg_params, target, w_avg, w_std,
                         jax.random.PRNGKey(7))[0]

    mesh = mesh_lib.get_mesh(4)
    rep, bat = mesh_lib.replicated(mesh), mesh_lib.batch_sharding(mesh)
    sharded_fn = jax.jit(fn, in_shardings=(rep, rep, bat, rep, rep, rep),
                         out_shardings=(bat, rep))
    sharded = sharded_fn(g_params, vgg_params,
                         jax.device_put(target, bat), w_avg, w_std,
                         jax.random.PRNGKey(7))[0]
    # Same budget as the walk's sharded==single test (test_multichip.py):
    # GSPMD re-associates reductions across shards; Adam's rsqrt
    # amplifies the fp32 noise a little per step.
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               rtol=1e-2, atol=2e-3)

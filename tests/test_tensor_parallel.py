"""Tensor parallelism (beyond the reference): conv output channels
sharded over a 'model' mesh axis, GSPMD inserting the channel
collectives. Serves the latency-bound regime DP cannot: a batch too
small to split across all chips still spreads its FLOPs over the TP
group. The reference has no counterpart (torch DataParallel only,
SURVEY.md §2.6); numerics must be identical to single-device up to
reduction order.
"""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from latentaugment_tpu import benchmark
from latentaugment_tpu.models.stylegan2 import networks
from latentaugment_tpu.parallel import mesh as pmesh


def _n_tp_leaves(shardings):
    return sum(1 for s in jax.tree_util.tree_leaves(shardings)
               if s.spec != P())


def test_tp_tree_shardings_rule():
    """Only divisible conv-weight leaves shard; 1-D mesh → all replicated."""
    tree = {
        "conv": np.zeros((64, 32, 3, 3), np.float32),    # TP
        "torgb": np.zeros((2, 64, 1, 1), np.float32),    # out_c=2: repl
        "bias": np.zeros((64,), np.float32),             # repl
        "affine": np.zeros((64, 512), np.float32),       # 2-D: repl
        "stats": np.zeros((8, 512), np.float32),         # repl
    }
    mesh2d = pmesh.get_mesh(4, n_model=2)
    sh = pmesh.tp_tree_shardings(tree, mesh2d)
    assert sh["conv"].spec == P("model")
    for k in ("torgb", "bias", "affine", "stats"):
        assert sh[k].spec == P(), k
    assert pmesh.model_axis_size(mesh2d) == 2

    mesh1d = pmesh.get_mesh(4)
    sh1 = pmesh.tp_tree_shardings(tree, mesh1d)
    assert _n_tp_leaves(sh1) == 0
    assert pmesh.model_axis_size(mesh1d) == 1

    with pytest.raises(ValueError):
        pmesh.get_mesh(4, n_model=3)  # must divide the device count


def test_tp_generator_matches_single():
    """Generator under a (data=2, model=2) mesh == single device."""
    cfg = networks.generator_config(z_dim=64, w_dim=64, img_resolution=32,
                                    img_channels=2, channel_base=1024,
                                    channel_max=64, num_mapping_layers=2)
    params = networks.generator_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(2), (4, cfg.z_dim))
    ref = networks.generator_apply(params, cfg, z)

    mesh = pmesh.get_mesh(4, n_model=2)
    sh = pmesh.tp_tree_shardings(params, mesh)
    assert _n_tp_leaves(sh) >= 3  # real TP placement, not silently replicated
    batch = pmesh.batch_sharding(mesh)
    f = jax.jit(lambda p, zz: networks.generator_apply(p, cfg, zz),
                in_shardings=(sh, batch), out_shardings=batch)
    out = f(jax.device_put(params, sh), jax.device_put(z, batch))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-3, atol=1e-4)


def test_n_model_devices_without_mesh_rejected(tmp_path_factory):
    """--n_model_devices without --n_mesh_devices must raise, not
    silently drop the TP request and run single-device."""
    from latentaugment_tpu.options import AugOptions
    from latentaugment_tpu.augments import create_augment

    from synthetic import build_workspace

    ws = build_workspace(tmp_path_factory.mktemp("ws_tp_bad"))
    opt = AugOptions().parse(
        argv=list(ws["argv"]) + ["--n_model_devices", "2"],
        install_logger=False)
    with pytest.raises(ValueError, match="n_mesh_devices"):
        create_augment(opt)


@pytest.mark.slow
def test_tp_sharded_walk_matches_single_device():
    """Full K-step walk on a (data=4, model=2) mesh == unsharded walk."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2, crop_size=16,
        manifold_items=8, w_lpips=0.0)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch_size=8)

    img_single, ws_single, _ = jax.jit(fns.walk)(bundle, w0, crop_pos,
                                                 synth_key)

    mesh = pmesh.get_mesh(8, n_model=2)
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)
    bundle_sh = pmesh.tp_tree_shardings(bundle, mesh)
    assert _n_tp_leaves(bundle_sh) >= 3
    walk = jax.jit(fns.walk, in_shardings=(bundle_sh, batch, repl, repl),
                   out_shardings=(batch, batch, repl))
    img_sh, ws_sh, _ = walk(jax.device_put(bundle, bundle_sh),
                            jax.device_put(w0, batch), crop_pos, synth_key)

    np.testing.assert_allclose(np.asarray(img_single), np.asarray(img_sh),
                               rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ws_single), np.asarray(ws_sh),
                               rtol=1e-2, atol=2e-3)


@pytest.mark.slow
def test_policy_with_tp_mesh(tmp_path_factory):
    """Engine-level DP×TP: --n_mesh_devices 8 --n_model_devices 2 runs the
    public policy path on a (data=4, model=2) mesh."""
    from latentaugment_tpu.options import AugOptions
    from latentaugment_tpu.data import create_dataset
    from latentaugment_tpu.augments import create_augment

    from synthetic import RES, build_workspace

    ws = build_workspace(tmp_path_factory.mktemp("ws_tp"))
    argv = list(ws["argv"])
    argv[argv.index("--batch_size") + 1] = "8"  # divisible by data axis (4)
    opt = AugOptions().parse(
        argv=argv + ["--init_w", "inv", "--p_thres", "0.0",
                     "--n_mesh_devices", "8", "--n_model_devices", "2",
                     "--w_pix", "0.1", "--w_lpips", "0.0",
                     "--w_latent", "0.001", "--w_disc", "0.01"],
        install_logger=False)
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    mesh = augment.latent_aug.mesh
    assert mesh is not None and pmesh.model_axis_size(mesh) == 2

    batch = next(iter(dataset))
    augment.set_input(batch)
    augment.forward()
    out = augment.get_output()
    assert out["A"].shape == (8, 1, RES, RES)
    assert np.isfinite(out["A"]).all()
    w_in = augment.get_latent_input()
    w_out = augment.get_latent_output()
    assert not np.allclose(w_in["w"], w_out["w"])

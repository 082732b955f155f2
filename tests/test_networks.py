"""StyleGAN2 network tests: shapes, w-contract, jit/grad, converter round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentaugment_tpu.models.stylegan2 import networks
from latentaugment_tpu.models.stylegan2 import convert


@pytest.fixture(scope="module")
def tiny_g():
    cfg = networks.generator_config(z_dim=64, w_dim=64, img_resolution=32,
                                    img_channels=2, channel_base=1024,
                                    channel_max=128, num_mapping_layers=2)
    params = networks.generator_init(jax.random.PRNGKey(0), cfg)
    return params, cfg


@pytest.fixture(scope="module")
def tiny_d():
    cfg = networks.discriminator_config(img_resolution=32, img_channels=2,
                                        channel_base=1024, channel_max=128,
                                        mbstd_group_size=2)
    params = networks.discriminator_init(jax.random.PRNGKey(1), cfg)
    return params, cfg


def test_num_ws_256():
    cfg = networks.generator_config(img_resolution=256)
    assert cfg.num_ws == 14  # 1 + 2*6 convs + final torgb


def test_num_ws_32():
    cfg = networks.generator_config(img_resolution=32, channel_base=1024)
    # blocks 4,8,16,32 -> convs 1+2+2+2 = 7, +1 torgb = 8
    assert cfg.num_ws == 8


def test_generator_shapes(tiny_g):
    params, cfg = tiny_g
    z = jax.random.normal(jax.random.PRNGKey(2), (3, cfg.z_dim))
    ws = networks.mapping_apply(params['mapping'], cfg, z)
    assert ws.shape == (3, cfg.num_ws, cfg.w_dim)
    img = networks.synthesis_apply(params['synthesis'], cfg, ws)
    assert img.shape == (3, 2, 32, 32)
    assert img.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(img)))


def test_generator_output_scale(tiny_g):
    """Random-init SG2 output should be O(1) (demod keeps activations unit)."""
    params, cfg = tiny_g
    z = jax.random.normal(jax.random.PRNGKey(3), (8, cfg.z_dim))
    img = networks.generator_apply(params, cfg, z)
    s = float(jnp.std(img))
    assert 0.01 < s < 100.0


def test_truncation(tiny_g):
    params, cfg = tiny_g
    # Set a nonzero w_avg so truncation is observable.
    params = dict(params)
    mp = dict(params['mapping'])
    mp['w_avg'] = jnp.ones((cfg.w_dim,)) * 0.3
    z = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.z_dim))
    w_full = networks.mapping_apply(mp, cfg, z, truncation_psi=1.0)
    w_zero = networks.mapping_apply(mp, cfg, z, truncation_psi=0.0)
    np.testing.assert_allclose(np.asarray(w_zero),
                               np.broadcast_to(0.3, w_zero.shape), atol=1e-6)
    w_half = networks.mapping_apply(mp, cfg, z, truncation_psi=0.5)
    np.testing.assert_allclose(np.asarray(w_half),
                               0.5 * np.asarray(w_full) + 0.5 * 0.3, atol=1e-5)


def test_synthesis_jit_and_grad(tiny_g):
    params, cfg = tiny_g

    @jax.jit
    def loss_fn(ws):
        img = networks.synthesis_apply(params['synthesis'], cfg, ws)
        return jnp.mean(jnp.square(img))

    z = jax.random.normal(jax.random.PRNGKey(5), (2, cfg.z_dim))
    ws = networks.mapping_apply(params['mapping'], cfg, z)
    g = jax.jit(jax.grad(loss_fn))(ws)
    assert g.shape == ws.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_noise_modes_differ(tiny_g):
    params, cfg = tiny_g
    # noise_strength is zero at init; set nonzero to observe modes.
    params = jax.tree_util.tree_map(lambda x: x, params)
    for res in cfg.block_resolutions:
        for conv in ('conv0', 'conv1'):
            layer = params['synthesis'][f'b{res}'].get(conv)
            if layer is not None:
                layer['noise_strength'] = jnp.asarray(0.1)
    z = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.z_dim))
    ws = networks.mapping_apply(params['mapping'], cfg, z)
    a = networks.synthesis_apply(params['synthesis'], cfg, ws, noise_mode='const')
    b = networks.synthesis_apply(params['synthesis'], cfg, ws, noise_mode='const')
    c = networks.synthesis_apply(params['synthesis'], cfg, ws, noise_mode='none')
    d = networks.synthesis_apply(params['synthesis'], cfg, ws, noise_mode='random',
                                 rng=jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # const is deterministic
    assert not np.allclose(np.asarray(a), np.asarray(c))
    assert not np.allclose(np.asarray(c), np.asarray(d))


@pytest.mark.slow
def test_discriminator(tiny_d):
    params, cfg = tiny_d
    img = jax.random.normal(jax.random.PRNGKey(8), (4, 2, 32, 32))
    logits = networks.discriminator_apply(params, cfg, img)
    assert logits.shape == (4, 1)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # Differentiable w.r.t. the image (needed for the latent walk).
    g = jax.grad(lambda x: jnp.sum(networks.discriminator_apply(params, cfg, x)))(img)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.slow
def test_matmul_blur_flag_preserves_network_numerics():
    """Enabling the banded-matmul FIR auto path (set_allow_matmul_blur)
    must leave G synthesis and D forward/backward numerically unchanged:
    the band matrix bakes the same shift-add linear map, so the only
    difference is reduction order on the MXU (f32 accumulation on CPU).
    Res 64 so the W>=64 auto gate actually diverts the network FIRs."""
    import importlib

    uf_mod = importlib.import_module("latentaugment_tpu.ops.upfirdn2d")

    g_cfg = networks.generator_config(z_dim=64, w_dim=64, img_resolution=64,
                                      img_channels=2, channel_base=2048,
                                      channel_max=128, num_mapping_layers=2)
    g_params = networks.generator_init(jax.random.PRNGKey(0), g_cfg)
    d_cfg = networks.discriminator_config(img_resolution=64, img_channels=2,
                                          channel_base=2048, channel_max=128,
                                          mbstd_group_size=2)
    d_params = networks.discriminator_init(jax.random.PRNGKey(1), d_cfg)

    z = jax.random.normal(jax.random.PRNGKey(2), (2, g_cfg.z_dim))
    img_in = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 64, 64))

    def run_all():
        img = networks.generator_apply(g_params, g_cfg, z)
        logits = networks.discriminator_apply(d_params, d_cfg, img_in)
        gimg = jax.grad(lambda x: jnp.sum(
            networks.discriminator_apply(d_params, d_cfg, x)))(img_in)
        return (np.asarray(img), np.asarray(logits), np.asarray(gimg))

    prev = uf_mod._ALLOW_MATMUL_BLUR
    try:
        uf_mod.set_allow_matmul_blur(False)
        base = run_all()
        uf_mod.set_allow_matmul_blur(True)
        mm = run_all()
    finally:
        uf_mod.set_allow_matmul_blur(prev)

    for a, b in zip(base, mm):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_minibatch_stddev_math():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 6, 3, 3).astype(np.float32))
    out = networks.minibatch_stddev(x, group_size=2, num_channels=1)
    assert out.shape == (4, 7, 3, 3)
    # Hand-compute for the first group.
    xn = np.asarray(x)
    grp = xn.reshape(2, 2, 1, 6, 3, 3)  # [G, n//G, F, c, H, W]
    y = grp - grp.mean(axis=0, keepdims=True)
    y = np.sqrt((y ** 2).mean(axis=0) + 1e-8)
    y = y.mean(axis=(2, 3, 4))  # [n//G, F]
    np.testing.assert_allclose(np.asarray(out[0, 6]), y[0, 0], rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path, tiny_g, tiny_d):
    g_params, g_cfg = tiny_g
    d_params, d_cfg = tiny_d
    path = str(tmp_path / "ckpt.pkl")
    convert.save_checkpoint(path, g_params, g_cfg, d_params, d_cfg)
    g2, gc2, d2, dc2 = convert.load_stylegan(path)
    assert gc2.num_ws == g_cfg.num_ws
    z = jax.random.normal(jax.random.PRNGKey(9), (2, g_cfg.z_dim))
    img1 = networks.generator_apply(g_params, g_cfg, z)
    img2 = networks.generator_apply(g2, gc2, z)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)
    logits1 = networks.discriminator_apply(d_params, d_cfg, img1)
    logits2 = networks.discriminator_apply(d2, dc2, img1)
    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logits2), atol=1e-5)


def test_persistence_payload_ingestion():
    """Restricted unpickler must extract state without executing source."""
    import pickle as pkl

    import torch

    # Simulate the persistence wire format: a reduce call to
    # torch_utils.persistence._reconstruct_persistent_obj with a meta dict
    # carrying dangerous 'module_src' that must NOT be executed.
    meta = {
        "type": "class",
        "version": 6,
        "module_src": "raise RuntimeError('must not execute')",
        "class_name": "Generator",
        "state": {
            "_parameters": {"weight": torch.ones(2, 3)},
            "_buffers": {"w_avg": torch.zeros(4)},
            "_modules": {
                "mapping": {
                    "_parameters": {"bias": torch.full((5,), 2.0)},
                    "_buffers": {},
                    "_modules": {},
                },
            },
        },
        "init_args": (),
        "init_kwargs": {"z_dim": 512},
    }

    import io
    import sys
    import types as _types

    fake_mod = _types.ModuleType("torch_utils")
    fake_pers = _types.ModuleType("torch_utils.persistence")

    exec("def _reconstruct_persistent_obj(meta):\n"
         "    raise RuntimeError('must not execute on pickling side')\n",
         fake_pers.__dict__)
    fake_pers._reconstruct_persistent_obj.__module__ = "torch_utils.persistence"
    fake_mod.persistence = fake_pers
    sys.modules["torch_utils"] = fake_mod
    sys.modules["torch_utils.persistence"] = fake_pers

    buf = io.BytesIO()
    # Emit: torch_utils.persistence._reconstruct_persistent_obj(meta)
    payload_obj = _Reconstructable(meta)
    pkl.Pickler(buf).dump({"G_ema": payload_obj})
    del sys.modules["torch_utils"]
    del sys.modules["torch_utils.persistence"]

    obj = convert.load_network_pickle(io.BytesIO(buf.getvalue()))
    payload = obj["G_ema"]
    state = convert.payload_state_dict(payload)
    assert set(state) == {"weight", "w_avg", "mapping.bias"}
    np.testing.assert_allclose(state["mapping.bias"], 2.0)
    cfg = convert.infer_generator_config(payload, img_resolution=32,
                                         img_channels=2)
    assert cfg.z_dim == 512


class _Reconstructable:
    def __init__(self, meta):
        self.meta = meta

    def __reduce__(self):
        import torch_utils.persistence as tp  # the fake module injected above

        return (tp._reconstruct_persistent_obj, (self.meta,))


@pytest.mark.slow  # 30-60 s on the one-core box (round-4 fast-lane diet)
def test_orbax_checkpoint_roundtrip(tmp_path, tiny_g):
    pytest.importorskip("orbax.checkpoint")
    g_params, g_cfg = tiny_g
    path = str(tmp_path / "orbax_ckpt")
    convert.save_checkpoint_orbax(path, g_params, g_cfg)
    g2, gc2, d2, dc2 = convert.load_checkpoint_orbax(path)
    assert gc2.num_ws == g_cfg.num_ws
    z = jax.random.normal(jax.random.PRNGKey(3), (2, g_cfg.z_dim))
    img1 = networks.generator_apply(g_params, g_cfg, z)
    img2 = networks.generator_apply(g2, gc2, z)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)


def test_mapping_random_init_keeps_unit_scale():
    """FullyConnectedLayer init contract: the stored weight is
    randn/lr_multiplier, so the runtime lr_multiplier rescale leaves the
    effective init std at 1/sqrt(in) — an 8-layer 0.01-lr mapping must
    produce O(1) outputs from random init. Regression: without the
    division each layer shrank activations 100x (output ~1e-16), which
    zeroed projection-D logits and label gradients on random-init
    conditional networks."""
    cfg = networks.generator_config(z_dim=64, w_dim=64, img_resolution=16,
                                    img_channels=1, channel_base=512,
                                    channel_max=64)  # 8 mapping layers
    assert cfg.num_mapping_layers == 8 and cfg.mapping_lr_multiplier == 0.01
    params = networks.generator_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (32, cfg.z_dim))
    w = networks.mapping_apply(params['mapping'], cfg, z, broadcast=False)
    s = float(jnp.std(w))
    assert 0.05 < s < 20.0, f"mapping init scale off: std(w) = {s}"

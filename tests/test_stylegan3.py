"""Alias-free (StyleGAN3) generator family.

Validation strategy (no reference source exists — the reference ships
SG3 architectures only inside pickles, ref models/stylegan3/training/
contains no network code):
  * filter design vs scipy.signal.firwin (the designer the original
    architecture uses) on every layer spec of a real config plan;
  * equivariance oracles: an integer-pixel translation applied through
    the input transform must equal jnp.roll of the untransformed output
    to float roundoff, and a 90-degree rotation (radial config) must
    equal jnp.rot90 — these exercise the full chain (filters, padding
    arithmetic, up/down factors, Fourier phase conventions) end to end;
  * ingestion: a persistence-style payload with torch state-dict names
    round-trips through convert.load_stylegan dispatch.
"""

import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentaugment_tpu.models.stylegan2 import convert as convert_sg2
from latentaugment_tpu.models.stylegan3 import convert as convert_sg3
from latentaugment_tpu.models.stylegan3 import filters as f3
from latentaugment_tpu.models.stylegan3 import networks as n3


def tiny_cfg(**over):
    kw = dict(img_resolution=64, img_channels=2, num_layers=6,
              channel_base=2048, channel_max=64, num_fp16_res=0,
              z_dim=64, w_dim=64)
    kw.update(over)
    return n3.generator_config(**kw)


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_cfg()
    params = n3.generator_init(jax.random.PRNGKey(0), cfg)
    return cfg, params


# ----------------------------------------------------------------------------
# Filter design

def test_lowpass_design_matches_scipy_firwin():
    scipy_signal = pytest.importorskip("scipy.signal")
    cfg = n3.generator_config(img_resolution=256, img_channels=2)
    checked = 0
    for layer in cfg.layers:
        for taps, cutoff, width in (
                (layer.up_taps, layer.in_cutoff, layer.in_half_width * 2),
                (layer.down_taps, layer.out_cutoff, layer.out_half_width * 2)):
            if taps == 1:
                continue
            ours = f3.design_lowpass_filter(
                taps, cutoff, width, layer.tmp_sampling_rate)
            ref = scipy_signal.firwin(numtaps=taps, cutoff=cutoff,
                                      width=width, fs=layer.tmp_sampling_rate)
            np.testing.assert_allclose(ours, ref, atol=1e-7)
            checked += 1
    assert checked >= 20


def test_radial_filter_properties():
    f = f3.design_lowpass_filter(12, cutoff=2.0, width=2.0, fs=16.0,
                                 radial=True)
    assert f.shape == (12, 12)
    assert np.isfinite(f).all()
    np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(f, f.T, atol=1e-7)          # x/y symmetric
    np.testing.assert_allclose(f, f[::-1, ::-1], atol=1e-7)  # centrosymmetric
    # Odd-tap radial hits r == 0: the analytic jinc limit must be finite.
    f_odd = f3.design_lowpass_filter(11, cutoff=2.0, width=2.0, fs=16.0,
                                     radial=True)
    assert np.isfinite(f_odd).all()


def test_identity_filter_is_none():
    assert f3.design_lowpass_filter(1, 2.0, 2.0, 16.0) is None


# ----------------------------------------------------------------------------
# Config plan

def test_config_plan_structure():
    cfg = n3.generator_config(img_resolution=256, img_channels=3)
    assert len(cfg.layers) == 15 and cfg.num_ws == 16
    # First canvas: sampling rate 16 + 2*10 margin = 36 (the published
    # alias-free plans name their first layer L0_36_*).
    assert cfg.input.size == 36 and cfg.input.sampling_rate == 16.0
    assert cfg.input.bandwidth == 2.0
    # Critically-sampled tail runs margin-free at full resolution.
    assert [l.out_size for l in cfg.layers[-2:]] == [256, 256]
    assert cfg.layers[-1].is_torgb and cfg.layers[-1].out_channels == 3
    assert not cfg.layers[-2].is_torgb
    # Sampling rates are monotone non-decreasing powers of two.
    rates = [l.out_sampling_rate for l in cfg.layers]
    assert rates == sorted(rates)
    assert all(float(r).is_integer() and (int(r) & (int(r) - 1)) == 0
               for r in rates)
    # toRGB: no filtering, no resampling, 1x1 kernel.
    tor = cfg.layers[-1]
    assert (tor.up_factor, tor.down_factor) == (1, 1)
    assert (tor.up_taps, tor.down_taps) == (1, 1)
    assert tor.conv_kernel == 1
    # fp16 derivation (live formula — the plan stores no per-layer flag,
    # see networks.generator_config): high-rate layers only.
    fp16 = [l.out_sampling_rate * (2 ** cfg.num_fp16_res)
            > cfg.img_resolution for l in cfg.layers]
    assert fp16 == sorted(fp16)  # once on, stays on


def test_radial_config_marks_only_noncritical_layers():
    cfg = tiny_cfg(conv_kernel=1, use_radial_filters=True)
    assert all(l.conv_kernel == 1 for l in cfg.layers)
    for layer in cfg.layers:
        assert layer.down_radial == (not layer.is_critically_sampled)


# ----------------------------------------------------------------------------
# Forward

def test_forward_shape_and_finite(tiny_gen):
    cfg, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    img = n3.generator_apply(params, cfg, z)
    assert img.shape == (2, cfg.img_channels, 64, 64)
    assert img.dtype == jnp.float32
    assert bool(jnp.isfinite(img).all())
    # Not degenerate, and style-dependent.
    assert float(jnp.abs(img).mean()) > 1e-4
    z2 = jax.random.normal(jax.random.PRNGKey(2), (2, cfg.z_dim))
    img2 = n3.generator_apply(params, cfg, z2)
    assert float(jnp.abs(img - img2).max()) > 1e-3


def test_bf16_blocks_close_to_fp32(tiny_gen):
    cfg, params = tiny_gen
    cfg16 = tiny_cfg(num_fp16_res=4)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    a = n3.generator_apply(params, cfg, z)
    b = n3.generator_apply(params, cfg16, z)
    assert b.dtype == jnp.float32  # output always fp32
    assert float(jnp.abs(a - b).max()) < 0.1 * float(jnp.abs(a).max()) + 0.02


def test_fp16_knob_is_live_post_config(tiny_gen):
    """num_fp16_res is a RUNTIME knob: ingested SG3 checkpoints arrive
    with a num_fp16_res=0 plan (convert_sg3.infer_generator_config) and
    the engine sets cfg.num_fp16_res post-load — synthesis_apply must
    derive per-layer bf16 from the live value, not the plan-time
    layer.use_fp16 (a stale-plan fp32 run at 256²/b32 is a ~22 GB OOM
    on a 16 GB chip — CLAUDE.md)."""
    cfg0, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(3), (2, cfg0.z_dim))
    a_fp32 = np.asarray(n3.generator_apply(params, cfg0, z))

    cfg_post = tiny_cfg(num_fp16_res=0)  # the ingestion-shaped plan...
    cfg_post.num_fp16_res = 4            # ...with the knob set post-load
    b_post = np.asarray(n3.generator_apply(params, cfg_post, z))
    c_plan = np.asarray(n3.generator_apply(
        params, tiny_cfg(num_fp16_res=4), z))

    np.testing.assert_array_equal(b_post, c_plan)  # same program either way
    assert not np.array_equal(b_post, a_fp32), \
        "post-config num_fp16_res=4 still ran fp32 — the knob is dead"


def test_synthesis_matmul_fir_path_matches_shift_add(tiny_gen):
    """The banded-matmul FIR path (the TPU default for the alias-free
    family's wide taps; forced here — CPU defaults to shift-add) equals
    the shift-add decomposition through a full synthesis forward."""
    import importlib

    uf_mod = importlib.import_module("latentaugment_tpu.ops.upfirdn2d")
    cfg, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.z_dim))
    a = np.asarray(n3.generator_apply(params, cfg, z))
    prev = uf_mod._ALLOW_MATMUL_BLUR
    uf_mod.set_allow_matmul_blur(True)
    try:
        b = np.asarray(n3.generator_apply(params, cfg, z))
    finally:
        uf_mod.set_allow_matmul_blur(prev)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_remat_matches_plain(tiny_gen):
    cfg, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    ws = n3.mapping_apply(params['mapping'], cfg, z)
    a = n3.synthesis_apply(params['synthesis'], cfg, ws)
    b = n3.synthesis_apply(params['synthesis'], cfg, ws, remat=True)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_grad_through_ws(tiny_gen):
    cfg, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    ws = n3.mapping_apply(params['mapping'], cfg, z)

    def loss(ws):
        return jnp.mean(jnp.square(
            n3.synthesis_apply(params['synthesis'], cfg, ws, remat=True)))

    g = jax.grad(loss)(ws)
    assert g.shape == ws.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


# ----------------------------------------------------------------------------
# Equivariance oracles

def test_translation_equivariance_exact(tiny_gen):
    """An integer-pixel translation through the input transform equals
    jnp.roll of the untransformed output to float roundoff — this is the
    architecture's defining property and exercises every filter, pad and
    phase in the chain. transform +dx moves content by -dx*sr pixels."""
    cfg, params = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    ws = n3.mapping_apply(params['mapping'], cfg, z)
    base = n3.synthesis_apply(params['synthesis'], cfg, ws)
    p = 8
    sr = cfg.layers[-1].out_sampling_rate
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = p / sr
    shifted = n3.synthesis_apply(params['synthesis'], cfg, ws, transform=T)
    crop = (slice(None), slice(None), slice(16, 48), slice(16, 48))
    err = float(jnp.abs(shifted - jnp.roll(base, -p, axis=3))[crop].max())
    null = float(jnp.abs(shifted - base)[crop].max())
    assert err < 1e-5, err
    assert null > 1000 * max(err, 1e-9)  # the shift itself is large


def test_rotation_equivariance_exact_radial():
    """90-degree rotation on the rotation-equivariant config (1x1 convs,
    radial down filters) equals jnp.rot90 to float roundoff."""
    cfg = tiny_cfg(conv_kernel=1, use_radial_filters=True, channel_base=4096,
                   channel_max=128)
    params = n3.generator_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    ws = n3.mapping_apply(params['mapping'], cfg, z)
    base = n3.synthesis_apply(params['synthesis'], cfg, ws)
    T = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
    rot = n3.synthesis_apply(params['synthesis'], cfg, ws, transform=T)
    crop = (slice(None), slice(None), slice(16, 48), slice(16, 48))
    err = float(jnp.abs(rot - jnp.rot90(base, 1, axes=(2, 3)))[crop].max())
    null = float(jnp.abs(rot - base)[crop].max())
    assert err < 1e-5, err
    assert null > 1000 * max(err, 1e-9)


# ----------------------------------------------------------------------------
# Ingestion

def _torch_style_state(params):
    """Flatten our param tree to torch state-dict names."""
    flat = {}

    def visit(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    visit("", params)
    return flat


def test_state_dict_roundtrip(tiny_gen):
    cfg, params = tiny_gen
    state = _torch_style_state(params)
    # Spot-check the naming contract.
    assert "synthesis.input.freqs" in state
    assert any(k.startswith("synthesis.L0_36_") and k.endswith("magnitude_ema")
               for k in state)
    tree = convert_sg3.generator_tree_from_state(state, cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    a = n3.generator_apply(params, cfg, z)
    b = n3.generator_apply(tree, cfg, z)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_missing_layer_raises(tiny_gen):
    cfg, params = tiny_gen
    state = _torch_style_state(params)
    bad = {k: v for k, v in state.items() if ".L1_" not in k}
    with pytest.raises(ValueError, match="missing layer"):
        convert_sg3.generator_tree_from_state(bad, cfg)


def test_filters_redesigned_when_absent(tiny_gen):
    cfg, params = tiny_gen
    state = {k: v for k, v in _torch_style_state(params).items()
             if not k.endswith(("up_filter", "down_filter"))}
    tree = convert_sg3.generator_tree_from_state(state, cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    a = n3.generator_apply(params, cfg, z)
    b = n3.generator_apply(tree, cfg, z)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_load_stylegan_dispatches_on_class_name(tmp_path, tiny_gen):
    cfg, params = tiny_gen
    payload = {
        "class_name": "training.networks_stylegan3.Generator",
        "init_kwargs": {
            "z_dim": cfg.z_dim, "c_dim": 0, "w_dim": cfg.w_dim,
            "img_resolution": cfg.img_resolution,
            "img_channels": cfg.img_channels,
            "channel_base": cfg.channel_base, "channel_max": cfg.channel_max,
            "num_layers": cfg.num_layers,
            "mapping_kwargs": {"num_layers": cfg.num_mapping_layers},
            "magnitude_ema_beta": 0.999,  # trainer knob: accepted, ignored
        },
        "state": _torch_style_state(params),
    }
    path = tmp_path / "sg3.pkl"
    with open(path, "wb") as f:
        pickle.dump({"G_ema": payload}, f)
    g_params, g_cfg, d_params, d_cfg = convert_sg2.load_stylegan(str(path))
    assert g_cfg.arch == "stylegan3"
    assert g_cfg.num_ws == cfg.num_ws
    assert d_params is None and d_cfg is None
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    a = n3.generator_apply(params, cfg, z)
    b = n3.generator_apply(g_params, g_cfg, z)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_native_checkpoint_roundtrip(tmp_path, tiny_gen):
    cfg, params = tiny_gen
    path = tmp_path / "native.pkl"
    convert_sg2.save_checkpoint(str(path), g_params=params, g_cfg=cfg)
    g_params, g_cfg, _, _ = convert_sg2.load_stylegan(str(path))
    assert g_cfg.arch == "stylegan3"
    z = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim))
    np.testing.assert_allclose(n3.generator_apply(params, cfg, z),
                               n3.generator_apply(g_params, g_cfg, z),
                               atol=1e-6)


def test_conditional_mapping():
    cfg = tiny_cfg(c_dim=3)
    params = n3.generator_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    c = jnp.eye(3)[jnp.array([0, 2])]
    img = n3.generator_apply(params, cfg, z, c=c)
    assert img.shape == (2, cfg.img_channels, 64, 64)
    c2 = jnp.eye(3)[jnp.array([1, 1])]
    img2 = n3.generator_apply(params, cfg, z, c=c2)
    assert float(jnp.abs(img - img2).max()) > 1e-3


# ----------------------------------------------------------------------------
# Latent-walk engine over the alias-free family

@pytest.fixture(scope="module")
def sg3_walk_setup():
    from latentaugment_tpu import benchmark

    # Small alias-free G + SG2 D; LPIPS off to keep the CPU compile light
    # (the VGG path is arch-independent and covered elsewhere).
    return benchmark.build_synthetic_setup(
        res=64, channel_base=2048, channel_max=64, num_epochs=3,
        crop_size=16, w_pix=0.1, w_lpips=0.0, w_latent=0.001, w_disc=0.05,
        manifold_items=16, remat=False, num_fp16_res=0,
        arch="stylegan3", num_layers=6, z_dim=64, w_dim=64)


def test_walk_runs_on_sg3(sg3_walk_setup):
    fns, bundle, g_cfg = sg3_walk_setup
    assert g_cfg.arch == "stylegan3"
    walk = jax.jit(fns.walk)
    w0 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, g_cfg.w_dim)) * 0.1
    crop_pos = jnp.asarray([1, 2], dtype=jnp.int32)
    img, ws_aug, traces = walk(bundle, w0, crop_pos, jax.random.PRNGKey(2))
    assert img.shape == (4, g_cfg.img_channels, 64, 64)
    assert ws_aug.shape == (4, g_cfg.num_ws, g_cfg.w_dim)
    assert np.all(np.isfinite(np.asarray(img)))
    assert traces["loss"].shape == (3,)
    # The walk moved w (the gradient actually flows through SG3 synthesis).
    moved = np.abs(np.asarray(ws_aug[:, 0]) - np.asarray(w0[:, 0])).max()
    assert moved > 1e-6


def test_ganrand_and_z_to_w_on_sg3(sg3_walk_setup):
    fns, bundle, g_cfg = sg3_walk_setup
    z = jax.random.normal(jax.random.PRNGKey(3), (2, g_cfg.z_dim))
    img, ws = fns.ganrand(bundle, z, jax.random.PRNGKey(4))
    assert img.shape == (2, g_cfg.img_channels, 64, 64)
    assert ws.shape == (2, g_cfg.num_ws, g_cfg.w_dim)
    w = fns.z_to_w(bundle, z)
    assert w.shape == (2, 1, g_cfg.w_dim)
    assert np.all(np.isfinite(np.asarray(img)))


@pytest.mark.slow
def test_sg3_walk_sharded_matches_single(sg3_walk_setup):
    """Batch-sharded SG3 walk over the 8-device CPU mesh == single-device."""
    from latentaugment_tpu.parallel import mesh as pmesh

    fns, bundle, g_cfg = sg3_walk_setup
    mesh = pmesh.get_mesh(8)
    b, r = pmesh.batch_sharding(mesh), pmesh.replicated(mesh)
    w0 = jax.random.normal(jax.random.PRNGKey(1), (8, 1, g_cfg.w_dim)) * 0.1
    crop_pos = jnp.asarray([1, 2], dtype=jnp.int32)
    key = jax.random.PRNGKey(2)

    img_s, ws_s, _ = jax.jit(fns.walk)(bundle, w0, crop_pos, key)
    sharded = jax.jit(fns.walk,
                      in_shardings=(r, b, r, r), out_shardings=(b, b, r))
    bundle_r = jax.device_put(bundle, r)
    img_m, ws_m, _ = sharded(bundle_r, jax.device_put(w0, b),
                             jax.device_put(crop_pos, r),
                             jax.device_put(key, r))
    # Cross-device reduction re-association drifts the walk slightly
    # (measured 1.8e-5 over 3 Adam steps on the 8-way CPU mesh).
    np.testing.assert_allclose(np.asarray(img_m), np.asarray(img_s),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ws_m), np.asarray(ws_s), atol=1e-4)


# ----------------------------------------------------------------------------
# Projector and StableHLO export over the alias-free family

@pytest.mark.slow
def test_projector_descends_on_sg3():
    from latentaugment_tpu.models import vgg
    from latentaugment_tpu.models.stylegan2 import projector

    cfg = tiny_cfg(img_resolution=32, num_layers=4, z_dim=32, w_dim=32)
    params = n3.generator_init(jax.random.PRNGKey(0), cfg)
    vgg_params = vgg.get_vgg16()  # seeded random init (no egress)
    key = jax.random.PRNGKey(2)
    w_avg, w_std = projector.w_stats(params["mapping"], cfg, key,
                                     n_samples=128)
    z_true = jax.random.normal(jax.random.PRNGKey(3), (2, cfg.z_dim))
    w_true = n3.mapping_apply(params["mapping"], cfg, z_true,
                              broadcast=False)[:, None, :]
    target = n3.synthesis_apply(
        params["synthesis"], cfg, jnp.repeat(w_true, cfg.num_ws, axis=1))
    project = jax.jit(projector.make_project_fn(cfg, num_steps=40,
                                                pix_weight=1.0))
    w_opt, dists = project(params, vgg_params, target, w_avg, w_std,
                           jax.random.PRNGKey(4))
    dists = np.asarray(dists)
    assert w_opt.shape == (2, 1, cfg.w_dim)
    assert np.isfinite(dists).all()
    assert dists[-1] < 0.6 * dists[0], f"no descent: {dists[0]} -> {dists[-1]}"


@pytest.mark.slow
def test_stablehlo_export_roundtrip_sg3(tmp_path, tiny_gen):
    from jax import export as jexport

    from scripts.export_model import main as export_main

    cfg, params = tiny_gen
    ckpt = str(tmp_path / "sg3.pkl")
    convert_sg2.save_checkpoint(ckpt, g_params=params, g_cfg=cfg)
    out = str(tmp_path / "g.shlo")
    export_main(["--checkpoint", ckpt, "--out", out])
    g = jexport.deserialize(open(out, "rb").read())
    for b in (1, 3):  # symbolic batch dim survives
        z = np.random.RandomState(b).randn(b, cfg.z_dim).astype(np.float32)
        got = np.asarray(g.call(z))
        ref = np.asarray(n3.generator_apply(params, cfg, jnp.asarray(z),
                                            noise_mode="const"))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

"""End-to-end golden parity: composed SG2 G/D vs the torch oracle, fed
through a REAL NVIDIA persistence-wire-format pickle.

Round-1 VERDICT #3/#4: op-level oracles can't catch a wrong gain, flip
convention, demod-eps placement, or w-broadcast indexing once composed —
these tests close that loop at 32² (all paths: up=2 blocks, demod on/off,
noise const/none, clamp engaged, truncation) and simultaneously exercise
the converter on the real wire format (EasyDict-style meta, nested
persistent submodules, full nn.Module __dict__ state).
"""

import io
import pickle

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from latentaugment_tpu.models.stylegan2 import convert, networks

import reference_oracles as oracle


def _build_torch_pair(seed=0, res=32, conv_clamp=256.0):
    torch.manual_seed(seed)
    g = oracle.GeneratorT(
        z_dim=64, w_dim=64, img_resolution=res, img_channels=2,
        mapping_kwargs={"num_layers": 2},
        synthesis_kwargs={"channel_base": 1024, "channel_max": 64,
                          "conv_clamp": conv_clamp})
    d = oracle.DiscriminatorT(img_resolution=res, img_channels=2,
                              channel_base=1024, channel_max=64,
                              conv_clamp=conv_clamp)
    # Nonzero w_avg so truncation actually moves w; nonzero noise strengths
    # so the noise path isn't silently multiplied by 0.
    with torch.no_grad():
        g.mapping.w_avg.copy_(torch.randn_like(g.mapping.w_avg) * 0.1)
        for m in g.modules():
            if isinstance(m, oracle.SynthesisLayerT):
                m.noise_strength.fill_(0.37)
    g.eval()
    d.eval()
    return g, d


def _convert_via_pickle(g, d):
    data = oracle.persistence_pickle_bytes({"G_ema": g, "D": d})
    return convert.load_stylegan(io.BytesIO(data))


@pytest.fixture(scope="module")
def pair():
    g, d = _build_torch_pair()
    g_params, g_cfg, d_params, d_cfg = _convert_via_pickle(g, d)
    return g, d, g_params, g_cfg, d_params, d_cfg


def test_inferred_configs(pair):
    _, _, g_params, g_cfg, d_params, d_cfg = pair
    assert g_cfg.z_dim == 64 and g_cfg.w_dim == 64
    assert g_cfg.img_resolution == 32 and g_cfg.img_channels == 2
    assert g_cfg.channel_base == 1024 and g_cfg.channel_max == 64
    assert g_cfg.num_mapping_layers == 2
    assert g_cfg.num_ws == 8
    assert d_cfg.img_resolution == 32
    assert d_cfg.channel_base == 1024
    # Nested persistence payloads flattened to the full param set.
    assert set(g_params["mapping"]) == {"fc0", "fc1", "w_avg"}
    assert "const" in g_params["synthesis"]["b4"]
    assert "noise_const" in g_params["synthesis"]["b8"]["conv0"]


@pytest.mark.parametrize("noise_mode,psi", [("const", 1.0), ("none", 1.0),
                                            ("const", 0.7)])
def test_generator_golden_parity(pair, noise_mode, psi):
    """Full z -> image parity vs torch across noise/truncation modes.

    Tolerance is tight enough that perturbing any single convention
    (lrelu sqrt(2) gain, FIR up-gain, flip_weight, demod eps, w-index
    schedule) fails the assert (verified by hand-perturbing each)."""
    g_t, _, g_params, g_cfg, _, _ = pair
    z = np.random.RandomState(1).randn(4, 64).astype(np.float32)
    with torch.no_grad():
        img_t = oracle.to_np(g_t(torch.from_numpy(z), truncation_psi=psi,
                                 noise_mode=noise_mode))
    img_j = np.asarray(networks.generator_apply(
        g_params, g_cfg, jnp.asarray(z), truncation_psi=psi,
        noise_mode=noise_mode))
    assert img_t.shape == img_j.shape == (4, 2, 32, 32)
    assert np.abs(img_t).max() > 0.05  # not trivially zero
    np.testing.assert_allclose(img_j, img_t, rtol=2e-4, atol=2e-4)


def test_generator_parity_with_clamp_engaged(pair):
    """conv_clamp placement: with clamp=0.3 most activations saturate, so a
    misplaced clamp (before gain, after toRGB bias, ...) diverges."""
    g_t, d_t = _build_torch_pair(seed=3, conv_clamp=0.3)
    g_params, g_cfg, _, _ = _convert_via_pickle(g_t, d_t)
    z = np.random.RandomState(2).randn(2, 64).astype(np.float32)
    with torch.no_grad():
        img_t = oracle.to_np(g_t(torch.from_numpy(z)))
    img_j = np.asarray(networks.generator_apply(g_params, g_cfg,
                                                jnp.asarray(z)))
    # Evidence the clamp engaged: same weights with clamp=256 differ.
    wide = dict(g_cfg)
    wide["conv_clamp"] = 256.0
    img_wide = np.asarray(networks.generator_apply(
        g_params, type(g_cfg)(wide), jnp.asarray(z)))
    assert np.abs(img_wide - img_j).max() > 1e-3
    np.testing.assert_allclose(img_j, img_t, rtol=2e-4, atol=2e-4)


def test_discriminator_golden_parity(pair):
    _, d_t, _, _, d_params, d_cfg = pair
    img = np.random.RandomState(5).randn(4, 2, 32, 32).astype(np.float32)
    with torch.no_grad():
        logits_t = oracle.to_np(d_t(torch.from_numpy(img)))
    logits_j = np.asarray(networks.discriminator_apply(
        d_params, d_cfg, jnp.asarray(img)))
    assert logits_t.shape == logits_j.shape == (4, 1)
    assert np.abs(logits_t).max() > 1e-3
    np.testing.assert_allclose(logits_j, logits_t, rtol=5e-4, atol=5e-4)


def test_epsilon_perturbation_is_caught(pair):
    """Sanity check ON THE TEST: a 1.001x gain error anywhere in the
    synthesis trunk must exceed the parity tolerance — otherwise the
    golden tests above prove nothing."""
    g_t, _, g_params, g_cfg, _, _ = pair
    z = np.random.RandomState(1).randn(4, 64).astype(np.float32)
    with torch.no_grad():
        img_t = oracle.to_np(g_t(torch.from_numpy(z)))
    import jax

    bad = jax.tree_util.tree_map(lambda x: x, g_params)  # shallow-ish copy
    bad["synthesis"] = dict(bad["synthesis"])
    bad["synthesis"]["b8"] = dict(bad["synthesis"]["b8"])
    bad["synthesis"]["b8"]["conv0"] = dict(bad["synthesis"]["b8"]["conv0"])
    bad["synthesis"]["b8"]["conv0"]["bias"] = \
        bad["synthesis"]["b8"]["conv0"]["bias"] + 0.01
    img_bad = np.asarray(networks.generator_apply(bad, g_cfg, jnp.asarray(z)))
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(img_bad, img_t, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Converter wire-format details


def test_payload_state_has_module_internals(pair):
    """The pickle state really is a full nn.Module __dict__ (training flag,
    _non_persistent_buffers_set, hook dicts) — the simplified round-1
    fixture didn't cover this."""
    g_t, d_t, *_ = pair
    data = oracle.persistence_pickle_bytes({"G_ema": g_t})
    obj = convert.load_network_pickle(io.BytesIO(data))
    state = obj["G_ema"]["state"]
    assert state["training"] is False
    assert isinstance(state["_non_persistent_buffers_set"], set)
    assert "_modules" in state and "mapping" in state["_modules"]
    # Nested submodule arrives as an intercepted payload, not executed code.
    sub = state["_modules"]["mapping"]
    assert isinstance(sub, convert._PersistencePayload)
    assert sub["module_src"].startswith("#")  # embedded source NOT executed


# ---------------------------------------------------------------------------
# Security: the exact-name allowlist (round-1 ADVICE high)


class _EvilEval:
    def __reduce__(self):
        return (eval, ("__import__('os').getcwd()",))


class _EvilSystem:
    def __reduce__(self):
        import os

        return (os.system, ("true",))


@pytest.mark.parametrize("evil", [_EvilEval, _EvilSystem])
def test_unpickler_blocks_code_execution(evil):
    data = pickle.dumps({"G_ema": evil()}, protocol=4)
    with pytest.raises(pickle.UnpicklingError, match="Blocked unpickle"):
        convert.load_network_pickle(io.BytesIO(data))


@pytest.mark.parametrize("evil", [_EvilEval, _EvilSystem])
def test_legacy_unpickler_blocks_code_execution(evil):
    from latentaugment_tpu.models.stylegan2 import legacy

    data = pickle.dumps((evil(),), protocol=4)
    with pytest.raises(pickle.UnpicklingError, match="Blocked unpickle"):
        legacy.load_network_pkl(io.BytesIO(data))


def test_unpickler_blocks_builtins_and_wildcard_torch():
    """find_class itself must reject builtins.eval and un-allowlisted
    torch callables (the round-1 exploit vector)."""
    u = convert._RestrictedUnpickler(io.BytesIO(b""))
    for mod, name in [("builtins", "eval"), ("builtins", "exec"),
                      ("builtins", "getattr"), ("os", "system"),
                      ("torch.serialization", "load"),
                      ("torch.hub", "load_state_dict_from_url"),
                      ("numpy", "load"), ("subprocess", "Popen")]:
        with pytest.raises(pickle.UnpicklingError):
            u.find_class(mod, name)
    # The legitimate reconstruction callables still resolve.
    import collections

    assert u.find_class("collections", "OrderedDict") is collections.OrderedDict
    assert u.find_class("torch._utils", "_rebuild_tensor_v2") is \
        torch._utils._rebuild_tensor_v2


def test_torch_tensor_roundtrip_through_allowlist():
    """A real torch state-dict pickle (storage _load_from_bytes path) still
    loads, and values survive."""
    t = {"w": torch.arange(6, dtype=torch.float32).reshape(2, 3),
         "p": torch.nn.Parameter(torch.ones(3))}
    data = pickle.dumps(t, protocol=2)
    out = convert.load_network_pickle(io.BytesIO(data))
    np.testing.assert_allclose(out["w"].numpy(),
                               np.arange(6, dtype=np.float32).reshape(2, 3))
    np.testing.assert_allclose(out["p"].detach().numpy(), 1.0)


def test_conditional_generator_and_discriminator_parity():
    """Conditional SG2 (c_dim > 0): label embed + normalized concat in the
    mapping, projection head <out, mapping(c)>/sqrt(cmap_dim) in D —
    end-to-end vs the torch oracle through the real pickle converter."""
    torch.manual_seed(11)
    c_dim = 3
    g_t = oracle.GeneratorT(
        z_dim=64, c_dim=c_dim, w_dim=64, img_resolution=32, img_channels=2,
        mapping_kwargs={"num_layers": 2},
        synthesis_kwargs={"channel_base": 1024, "channel_max": 64,
                          "conv_clamp": 256.0})
    d_t = oracle.DiscriminatorT(c_dim=c_dim, img_resolution=32,
                                img_channels=2, channel_base=1024,
                                channel_max=64, conv_clamp=256.0,
                                mapping_kwargs={"num_layers": 2})
    g_t.eval()
    d_t.eval()
    g_params, g_cfg, d_params, d_cfg = _convert_via_pickle(g_t, d_t)
    assert g_cfg.c_dim == c_dim and g_cfg.embed_features == 64
    assert d_cfg.c_dim == c_dim and d_cfg.cmap_dim == d_cfg.channels[4]

    rng = np.random.RandomState(7)
    z = rng.randn(8, 64).astype(np.float32)
    c = np.eye(c_dim, dtype=np.float32)[rng.randint(0, c_dim, 8)]

    with torch.no_grad():
        img_t = oracle.to_np(g_t(torch.from_numpy(z), torch.from_numpy(c)))
    img_j = np.asarray(networks.generator_apply(
        g_params, g_cfg, jnp.asarray(z), jnp.asarray(c)))
    np.testing.assert_allclose(img_j, img_t, rtol=2e-4, atol=2e-4)

    # The label must actually matter: a different class changes the image.
    c2 = np.roll(c, 1, axis=1)
    img_j2 = np.asarray(networks.generator_apply(
        g_params, g_cfg, jnp.asarray(z), jnp.asarray(c2)))
    assert np.abs(img_j2 - img_j).max() > 1e-4

    img = rng.randn(8, 2, 32, 32).astype(np.float32)
    with torch.no_grad():
        logits_t = oracle.to_np(d_t(torch.from_numpy(img),
                                    torch.from_numpy(c)))
    logits_j = np.asarray(networks.discriminator_apply(
        d_params, d_cfg, jnp.asarray(img), jnp.asarray(c)))
    assert logits_t.shape == logits_j.shape == (8, 1)
    np.testing.assert_allclose(logits_j, logits_t, rtol=5e-4, atol=5e-4)
    logits_j2 = np.asarray(networks.discriminator_apply(
        d_params, d_cfg, jnp.asarray(img), jnp.asarray(c2)))
    # Relative check: at random init the projection logits are ~1e-5 scale.
    assert np.abs(logits_j2 - logits_j).max() > 0.3 * np.abs(logits_j).max()

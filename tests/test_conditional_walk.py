"""Conditional (c_dim > 0) latent-walk support — TPU-side extension.

The reference's product path is unconditional (its inversion zips store
no labels), but its SG2 runtime format supports conditional checkpoints
(label-embed mapping + projection D). Our runtime already ingests and
golden-parity-tests those networks (test_torch_parity.py); these tests
cover driving the WALK itself with labels: engine.make_walk_fns threads
`c` to the projection discriminator (term_disc) and to the mapping net
(ganrand / z_to_w), and LatentAugEngine.forward/forward_ganrand accept
`c=`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latentaugment_tpu import benchmark

RES = 16
C_DIM = 3
N_MODES = 2


@pytest.fixture(scope="module")
def cond_setup():
    # w_lpips=0: no VGG — the conditional plumbing under test is the
    # disc/mapping path, and skipping the VGG keeps the CPU test fast.
    return benchmark.build_synthetic_setup(
        res=RES, channel_base=1024, channel_max=64, num_epochs=3,
        crop_size=8, w_pix=0.1, w_lpips=0.0, w_latent=0.001, w_disc=0.05,
        manifold_items=16, remat=False, c_dim=C_DIM)


def _one_hot(labels):
    return jnp.eye(C_DIM, dtype=jnp.float32)[jnp.asarray(labels)]


def test_conditional_walk_runs_and_depends_on_labels(cond_setup):
    fns, bundle, g_cfg = cond_setup
    walk = jax.jit(fns.walk)
    w0 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, g_cfg.w_dim)) * 0.1
    crop_pos = jnp.asarray([1, 2], dtype=jnp.int32)
    key = jax.random.PRNGKey(2)

    c_a = _one_hot([0, 1, 2, 0])
    c_b = _one_hot([2, 0, 1, 1])
    img_a, ws_a, traces_a = walk(bundle, w0, crop_pos, key, c_a)
    img_a2, ws_a2, _ = walk(bundle, w0, crop_pos, key, c_a)
    img_b, ws_b, _ = walk(bundle, w0, crop_pos, key, c_b)

    assert np.all(np.isfinite(np.asarray(img_a)))
    assert "loss_disc" in traces_a and traces_a["loss_disc"].shape == (3,)
    # Deterministic given the same labels...
    np.testing.assert_array_equal(np.asarray(ws_a), np.asarray(ws_a2))
    # ...and the projection-D gradient steers the trajectory per label.
    assert np.abs(np.asarray(ws_a) - np.asarray(ws_b)).max() > 0


def test_conditional_mapping_paths(cond_setup):
    fns, bundle, g_cfg = cond_setup
    z = jax.random.normal(jax.random.PRNGKey(3), (4, g_cfg.z_dim))
    key = jax.random.PRNGKey(4)

    w_a = fns.z_to_w(bundle, z, _one_hot([0, 0, 1, 2]))
    w_b = fns.z_to_w(bundle, z, _one_hot([1, 1, 0, 0]))
    assert w_a.shape == (4, 1, g_cfg.w_dim)
    assert np.abs(np.asarray(w_a) - np.asarray(w_b)).max() > 0

    img, ws = fns.ganrand(bundle, z, key, _one_hot([0, 1, 2, 0]))
    assert img.shape == (4, N_MODES, RES, RES)
    assert np.all(np.isfinite(np.asarray(img)))

    # A conditional checkpoint without labels is a clear error, not a
    # silent wrong answer (networks.mapping_apply asserts).
    with pytest.raises(AssertionError, match="c_dim"):
        fns.z_to_w(bundle, z)


@pytest.mark.slow
def test_conditional_walk_sharded_matches_single(cond_setup):
    """The mesh layout LatentAugEngine._cond_fn compiles (batch-sharded
    w0 AND labels, replicated bundle/crop/key) computes the same walk as
    the single-device program."""
    from latentaugment_tpu.parallel import mesh as pmesh

    fns, bundle, g_cfg = cond_setup
    mesh = pmesh.get_mesh(8)
    b, r = pmesh.batch_sharding(mesh), pmesh.replicated(mesh)

    w0 = jax.random.normal(jax.random.PRNGKey(7), (8, 1, g_cfg.w_dim)) * 0.1
    crop_pos = jnp.asarray([1, 2], dtype=jnp.int32)
    key = jax.random.PRNGKey(8)
    c = _one_hot([0, 1, 2, 0, 1, 2, 0, 1])

    img_1, ws_1, _ = jax.jit(fns.walk)(bundle, w0, crop_pos, key, c)
    walk_sh = jax.jit(fns.walk, in_shardings=(r, b, r, r, b),
                      out_shardings=(b, b, r))
    img_8, ws_8, _ = walk_sh(jax.device_put(bundle, r),
                             jax.device_put(w0, b), crop_pos, key,
                             jax.device_put(c, b))
    np.testing.assert_allclose(np.asarray(ws_1), np.asarray(ws_8),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_1), np.asarray(img_8),
                               rtol=0, atol=1e-4)


@pytest.mark.slow
def test_engine_forward_conditional(tmp_path):
    """LatentAugEngine._cond_fn dispatch end-to-end: a conditional
    checkpoint loaded through the full workspace (native ckpt, inversion
    zip, manifold stats) drives forward()/forward_ganrand() with labels,
    both w- and z-input routes."""
    from synthetic import build_workspace
    from latentaugment_tpu.augments.engine import define_latentaugment
    from latentaugment_tpu.options import AugOptions

    ws = build_workspace(tmp_path, c_dim=C_DIM)
    argv = ws["argv"] + ["--w_pix", "0.1", "--w_lpips", "0.0",
                         "--w_latent", "0.001", "--w_disc", "0.05"]
    opt = AugOptions().parse(argv=argv, install_logger=False)
    eng = define_latentaugment("latent_aug", "train", opt, str(tmp_path))

    rng = np.random.RandomState(0)
    w = rng.randn(2, 1, eng.w_dim).astype(np.float32) * 0.1
    c_a = np.asarray(_one_hot([0, 1]))
    c_b = np.asarray(_one_hot([2, 0]))
    key = jax.random.PRNGKey(5)

    img_a, ws_a = eng.forward(w, key=key, c=c_a)
    img_b, ws_b = eng.forward(w, key=key, c=c_b)
    assert img_a.shape == (2, 2, ws["g_cfg"].img_resolution,
                           ws["g_cfg"].img_resolution)
    assert np.all(np.isfinite(np.asarray(img_a)))
    # Projection-D gradients steer the walk differently per label.
    assert np.abs(np.asarray(ws_a) - np.asarray(ws_b)).max() > 0

    # z input: labels also feed the mapping net (conditional z_to_w).
    z = rng.randn(2, eng.z_dim).astype(np.float32)
    img_z, _ = eng.forward(z, key=key, c=c_a)
    assert np.all(np.isfinite(np.asarray(img_z)))

    img_g, ws_g = eng.forward_ganrand(z, key=key, c=c_b)
    assert np.all(np.isfinite(np.asarray(img_g)))

    # Conditional checkpoint + z input without labels must fail loudly.
    with pytest.raises(AssertionError, match="c_dim"):
        eng.forward(z, key=key)

    # Mis-shaped labels fail loudly too (engine._check_labels).
    with pytest.raises(AssertionError, match="one-hot"):
        eng.forward(w, key=key, c=np.ones((2, C_DIM + 1), np.float32))


@pytest.mark.slow
def test_unconditional_signature_unchanged():
    """c_dim=0 callers keep the 4-arg walk (regression guard for the
    engine's compiled in_shardings tuples and every existing caller).
    Slow lane: every engine/e2e test in the fast lane already runs
    4-arg walks; this is a focused arity guard."""
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=RES, channel_base=1024, channel_max=64, num_epochs=2,
        crop_size=8, w_pix=0.0, w_lpips=0.0, w_latent=0.0, w_disc=0.05,
        remat=False)
    w0 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, g_cfg.w_dim)) * 0.1
    img, ws, _ = jax.jit(fns.walk)(bundle, w0,
                                   jnp.asarray([1, 2], dtype=jnp.int32),
                                   jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(img)))

"""End-to-end K-step walk parity vs a torch oracle (round-2 VERDICT #1).

Golden parity covered G and D *forwards*; nothing compared the composed
walk — loss composition/signs/normalizations, crop geometry, LPIPS input
scale, Adam bias correction, soft/hard gate — against the reference's
exact protocol (util_latent_aug.py:207-310, :315-433). These tests run
the same weights, manifolds, and crop positions through both frameworks
for K Adam steps and assert the per-epoch loss traces and the final
latent trajectory agree to fp32 tolerance; perturbation tests prove a
wrong weight, sign, normalization, or crop offset fails the comparison.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from latentaugment_tpu.augments import engine, losses, manifold
from latentaugment_tpu.models import vgg

import reference_oracles as oracle
from test_torch_parity import _build_torch_pair, _convert_via_pickle

RES, CROP, N_MODES, B, M, K = 32, 16, 2, 2, 3, 5
WEIGHTS = dict(w_lpips=10.0, w_pix=0.1, w_latent=0.001, w_disc=0.01)
LR = 0.01
CROP_POS = (2, 4)  # (x, y), valid for center_crop_size(32)=22 - 16 = 6


def _to_np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


@pytest.fixture(scope="module")
def setup():
    """Shared weights + manifolds in both frameworks."""
    g_t, d_t = _build_torch_pair(seed=21)
    g_params, g_cfg, d_params, d_cfg = _convert_via_pickle(g_t, d_t)

    # VGG16 with non-trivial lin weights so the lin handling is exercised.
    vgg_params = vgg.init_vgg(jax.random.PRNGKey(3))
    lin_rng = np.random.RandomState(4)
    vgg_params["lin"] = {
        tap: jnp.asarray(lin_rng.uniform(0.5, 1.5, (vgg.LPIPS_CHANNELS[tap],))
                         .astype(np.float32))
        for tap in vgg.LPIPS_TAPS}
    vgg_np = _to_np(vgg_params)

    rng = np.random.RandomState(5)
    num_ws, w_dim = g_cfg.num_ws, g_cfg.w_dim
    W_manifold = rng.randn(M, num_ws, w_dim).astype(np.float32)

    # Real-image manifold from the same G (keeps pix/lpips scales honest).
    with torch.no_grad():
        X = oracle.to_np(g_t(torch.from_numpy(
            rng.randn(M, g_cfg.z_dim).astype(np.float32)), noise_mode="const"))

    # Feature manifold: fixed-crop LPIPS embeddings of X, torch-side.
    x_t = torch.from_numpy(X)
    cc = oracle.center_crop_torch(x_t, RES)
    fx, fy = 1, 2
    crops = cc[:, :, fy:fy + CROP, fx:fx + CROP]
    feas = []
    with torch.no_grad():
        for m in range(N_MODES):
            xm = crops[:, m:m + 1].repeat([1, 3, 1, 1])
            feas.append(oracle.vgg16_lpips_embed_torch(vgg_np, xm).numpy())

    w0 = rng.randn(B, 1, w_dim).astype(np.float32) * 0.5

    # Torch oracle: full K-step walk.
    history, w_aug_t, ws_aug_t = oracle.reference_walk_oracle(
        g_t, d_t, vgg_np, w0, num_epochs=K, opt_lr=LR, **WEIGHTS,
        W_manifold=W_manifold, X_manifold=X, fea_manifolds=feas,
        crop_pos=CROP_POS, crop_size=CROP, res=RES, n_modes=N_MODES)

    # Our side: identical state through the production bundle/walk path.
    bundle = engine.make_bundle(
        g_params, d_params, vgg_params,
        W_summary=losses.manifold_summary(jnp.asarray(W_manifold)),
        X_cc_summaries=[
            losses.manifold_summary(
                manifold.center_crop(jnp.asarray(X), RES)[:, m:m + 1])
            for m in range(N_MODES)],
        fea_summaries=[losses.manifold_summary(jnp.asarray(f)) for f in feas])

    fns = engine.make_walk_fns(
        g_cfg, d_cfg, n_modes=N_MODES, num_epochs=K, opt_lr=LR,
        crop_size=CROP, preprocess="center_random_crop", soft_aug=False,
        remat=False, lpips_variant="script", lpips_ref_input=True, **WEIGHTS)
    walk = jax.jit(fns.walk)
    img, ws_aug_j, traces = walk(bundle, jnp.asarray(w0),
                                 jnp.asarray(CROP_POS, jnp.int32),
                                 jax.random.PRNGKey(0))
    traces = _to_np(traces)

    return dict(history=history, ws_aug_t=ws_aug_t.numpy(),
                traces=traces, ws_aug_j=np.asarray(ws_aug_j), w0=w0,
                g_t=g_t, d_t=d_t, vgg_np=vgg_np, W=W_manifold, X=X,
                feas=feas)


def _trace_matrix(history, keys):
    return np.array([[h.get(k, 0.0) for k in keys] for h in history],
                    np.float64)


LOSS_KEYS = ["loss_latent", "loss_disc", "loss_pix", "loss_lpips", "loss"]


def test_per_epoch_loss_traces_match(setup):
    """Every weighted term and the composed total, every epoch."""
    ref = _trace_matrix(setup["history"], LOSS_KEYS)
    ours = np.stack([np.asarray(setup["traces"][k], np.float64)
                     for k in LOSS_KEYS], axis=1)
    assert ref.shape == ours.shape == (K, len(LOSS_KEYS))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-5)


def test_final_latent_trajectory_matches(setup):
    """The K-step Adam endpoint (hard gate, broadcast) agrees; the walk
    must also have actually moved w, or the comparison proves nothing."""
    ws_j, ws_t, w0 = setup["ws_aug_j"], setup["ws_aug_t"], setup["w0"]
    moved = np.abs(ws_t[:, :1] - w0).mean()
    assert moved > 5e-3, f"walk barely moved w ({moved})"
    np.testing.assert_allclose(ws_j, ws_t, rtol=5e-3, atol=5e-4)


def test_soft_gate_matches(setup):
    """soft_aug: w_aug = alpha*w_tilde + (1-alpha)*w (smooth_aug,
    util_latent_aug.py:440-449) — pin the blend direction."""
    g_t, d_t = setup["g_t"], setup["d_t"]
    g_params, g_cfg, d_params, d_cfg = _convert_via_pickle(g_t, d_t)
    alpha = 0.3
    _, w_aug_t, ws_aug_t = oracle.reference_walk_oracle(
        g_t, d_t, setup["vgg_np"], setup["w0"], num_epochs=2, opt_lr=LR,
        **WEIGHTS, W_manifold=setup["W"], X_manifold=setup["X"],
        fea_manifolds=setup["feas"], crop_pos=CROP_POS, crop_size=CROP,
        res=RES, n_modes=N_MODES, soft_aug=True, alpha=alpha)

    bundle = engine.make_bundle(
        g_params, d_params,
        jax.tree_util.tree_map(jnp.asarray, setup["vgg_np"]),
        W_summary=losses.manifold_summary(jnp.asarray(setup["W"])),
        X_cc_summaries=[
            losses.manifold_summary(
                manifold.center_crop(jnp.asarray(setup["X"]), RES)[:, m:m + 1])
            for m in range(N_MODES)],
        fea_summaries=[losses.manifold_summary(jnp.asarray(f))
                       for f in setup["feas"]])
    fns = engine.make_walk_fns(
        g_cfg, d_cfg, n_modes=N_MODES, num_epochs=2, opt_lr=LR,
        crop_size=CROP, preprocess="center_random_crop", soft_aug=True,
        alpha=alpha, remat=False, lpips_variant="script",
        lpips_ref_input=True, **WEIGHTS)
    _, ws_aug_j, _ = jax.jit(fns.walk)(
        bundle, jnp.asarray(setup["w0"]), jnp.asarray(CROP_POS, jnp.int32),
        jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(ws_aug_j), ws_aug_t.numpy(),
                               rtol=5e-3, atol=5e-4)
    # A wrong blend (alpha on w instead of w_tilde) must fail:
    wrong = alpha * setup["w0"] + (1 - alpha) * np.asarray(ws_aug_j[:, :1])
    assert not np.allclose(np.repeat(wrong, g_cfg.num_ws, 1), ws_aug_t.numpy(),
                           rtol=5e-3, atol=5e-4)


# ----------------------------------------------------------------------------
# Sensitivity: the comparison must FAIL when any convention is perturbed
# (otherwise the parity above proves nothing). Perturb the cheap torch side.

def _perturbed_ref(setup, **kwargs):
    args = dict(num_epochs=K, opt_lr=LR, **WEIGHTS,
                W_manifold=setup["W"], X_manifold=setup["X"],
                fea_manifolds=setup["feas"], crop_pos=CROP_POS,
                crop_size=CROP, res=RES, n_modes=N_MODES)
    args.update(kwargs)
    history, _, ws = oracle.reference_walk_oracle(
        setup["g_t"], setup["d_t"], setup["vgg_np"], setup["w0"], **args)
    return history, ws.numpy()


@pytest.mark.parametrize("perturb", [
    {"w_pix": WEIGHTS["w_pix"] * 1.05},          # loss weight
    {"disc_sign": -1.0},                          # composed loss sign
    {"crop_pos": (CROP_POS[0] + 1, CROP_POS[1])},  # crop offset
    {"opt_lr": LR * 1.02},                        # optimizer step size
])
def test_perturbations_are_caught(setup, perturb):
    history, ws = _perturbed_ref(setup, **perturb)
    ref = _trace_matrix(history, LOSS_KEYS)
    ours = np.stack([np.asarray(setup["traces"][k], np.float64)
                     for k in LOSS_KEYS], axis=1)
    traces_differ = not np.allclose(ours, ref, rtol=2e-3, atol=2e-5)
    traj_differs = not np.allclose(setup["ws_aug_j"], ws,
                                   rtol=5e-3, atol=5e-4)
    assert traces_differ or traj_differs, \
        f"perturbation {perturb} was not detected by either comparison"


def test_wrong_lpips_normalization_is_caught(setup):
    """Dividing the lpips pairwise sum by the feature dim (the 'obvious'
    normalization the reference deliberately omits) must be detected."""
    d_feat = setup["feas"][0].shape[1]
    scaled = [f / np.sqrt(d_feat) for f in setup["feas"]]  # ||.||^2 -> /D
    history, ws = _perturbed_ref(setup, fea_manifolds=scaled)
    ref = _trace_matrix(history, LOSS_KEYS)
    ours = np.stack([np.asarray(setup["traces"][k], np.float64)
                     for k in LOSS_KEYS], axis=1)
    assert not np.allclose(ours, ref, rtol=2e-3, atol=2e-5)


# ----------------------------------------------------------------------------
# The crop-offset convention that motivated the torchvision-rounding fix.

@pytest.mark.parametrize("res", [32, 64, 256])
def test_center_crop_matches_torchvision_rounding(res):
    """At res=256 the offset is 37.5 px: torchvision rounds to 38, floor
    gives 37 — a one-pixel crop offset on every pix/LPIPS crop."""
    x = np.arange(res * res, dtype=np.float32).reshape(1, 1, res, res)
    ours = np.asarray(manifold.center_crop(jnp.asarray(x), res))
    ref = oracle.center_crop_torch(torch.from_numpy(x), res).numpy()
    np.testing.assert_array_equal(ours, ref)

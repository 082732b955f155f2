"""Loss-math tests: pairwise identity, mean-form reduction, LPIPS property."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentaugment_tpu.augments import losses
from latentaugment_tpu.models import vgg

RNG = np.random.RandomState(3)


@pytest.mark.parametrize("shape_x,shape_y", [
    ((7, 5), (4, 5)),
    ((7, 3, 5), (4, 3, 5)),
    ((7, 2, 6, 6), (4, 2, 6, 6)),
])
def test_l2_vectorized_vs_bruteforce(shape_x, shape_y):
    X = RNG.randn(*shape_x).astype(np.float32)
    Y = RNG.randn(*shape_y).astype(np.float32)
    D = np.asarray(losses.l2_loss_vectorized(jnp.asarray(X), jnp.asarray(Y),
                                             compute_mean=False))
    # brute force
    Xf = X.reshape(X.shape[0], -1)
    Yf = Y.reshape(Y.shape[0], -1)
    brute = ((Yf[:, None, :] - Xf[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(D, brute, rtol=1e-3, atol=1e-3)

    mean = float(losses.l2_loss_vectorized(jnp.asarray(X), jnp.asarray(Y)))
    feat = int(np.prod(Y.shape[1:]))
    np.testing.assert_allclose(mean, brute.mean() / feat, rtol=1e-4)


@pytest.mark.parametrize("normalize", [True, False])
def test_mean_form_equals_pairwise_mean(normalize):
    """The engine's O(N) mean-form loss == the reference's O(N*M) pairwise mean."""
    X = RNG.randn(9, 3, 4, 4).astype(np.float32)
    Y = RNG.randn(5, 3, 4, 4).astype(np.float32)
    mean_ref = losses.l2_loss_vectorized(jnp.asarray(X), jnp.asarray(Y),
                                         compute_mean=False)
    mean_ref = float(jnp.sum(mean_ref)) / (9 * 5)
    if normalize:
        mean_ref /= 3 * 4 * 4
    xm, xs = losses.manifold_summary(jnp.asarray(X))
    got = float(losses.l2_mean_loss(jnp.asarray(Y), xm, xs, normalize=normalize))
    np.testing.assert_allclose(got, mean_ref, rtol=1e-4)


def test_mean_form_gradient_matches_pairwise():
    """Gradients w.r.t. Y must agree between the two formulations."""
    X = jnp.asarray(RNG.randn(6, 10).astype(np.float32))
    Y = jnp.asarray(RNG.randn(3, 10).astype(np.float32))

    def pairwise(y):
        return losses.l2_loss_vectorized(X, y, compute_mean=True)

    xm, xs = losses.manifold_summary(X)

    def meanform(y):
        return losses.l2_mean_loss(y, xm, xs)

    g1 = jax.grad(pairwise)(Y)
    g2 = jax.grad(meanform)(Y)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_disc_softplus():
    logits = jnp.asarray([[0.0], [100.0], [-100.0]])
    val = float(losses.disc_softplus_loss(logits))
    np.testing.assert_allclose(val, (np.log(2) + 0.0 + 100.0) / 3, rtol=1e-4)


def test_lpips_embedding_distance_property():
    """||f(x) - f(y)||^2 computed via embeddings equals the layerwise LPIPS sum."""
    params = vgg.init_vgg(jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.rand(2, 3, 32, 32).astype(np.float32) * 255)
    y = jnp.asarray(RNG.rand(2, 3, 32, 32).astype(np.float32) * 255)
    d_embed = np.asarray(vgg.lpips_distance(params, x, y))

    # Direct layerwise computation.
    acts_x = vgg.vgg_features(params, x, taps=vgg.LPIPS_TAPS)
    acts_y = vgg.vgg_features(params, y, taps=vgg.LPIPS_TAPS)
    total = np.zeros(2, np.float32)
    for tap in vgg.LPIPS_TAPS:
        ax, ay = acts_x[tap], acts_y[tap]

        def norm(a):
            return a * jax.lax.rsqrt(jnp.sum(jnp.square(a), 1, keepdims=True) + 1e-10)

        diff = norm(ax) - norm(ay)
        w = params["lin"][tap][None, :, None, None]
        total += np.asarray(jnp.mean(jnp.sum(w * jnp.square(diff), axis=1),
                                     axis=(1, 2)))
    np.testing.assert_allclose(d_embed, total, rtol=1e-3, atol=1e-4)


def test_lpips_features_jittable_and_differentiable():
    params = vgg.init_vgg(jax.random.PRNGKey(1))

    @jax.jit
    def loss(x):
        return jnp.sum(vgg.lpips_features(params, x))

    x = jnp.asarray(RNG.rand(1, 3, 32, 32).astype(np.float32) * 255)
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))

"""Latent-walk loss functions.

Parity: reference augments/utils/util_latent_aug.py:315-433.

`l2_loss_vectorized` reproduces the reference's closed-form pairwise L2
(einsum decomposition ||Y||^2 + ||X||^2 - 2 Y X^T) for 2/3/4-D tensors.

TPU-native optimization — `manifold_summary` / `l2_mean_loss`: every
manifold loss in the walk reduces the pairwise matrix with a *full
mean*, and

    mean_{n,m} ||y_n - x_m||^2
      = mean_n ||y_n||^2 + mean_m ||x_m||^2 - 2 mean_n <y_n, mean_m x_m>

so the manifold enters only through its MEAN vector and mean squared
norm. Precomputing that summary makes each optimization step O(N·D)
instead of O(N·M·D) — exact to the reference's loss value (tested in
test_losses.py), independent of manifold size, and removes the big
einsum from the K-step hot loop entirely.
"""

import jax
import jax.numpy as jnp


def l2_loss_vectorized(X, Y, compute_mean=True):
    """Pairwise squared-L2 between rows of Y [n,...] and X [m,...].

    Returns the [n, m] matrix, or (if compute_mean) the mean over all
    pairs additionally divided by the per-item feature size — matching
    the reference's normalization (util_latent_aug.py:315-361).
    """
    assert X.ndim == Y.ndim
    assert X.ndim in (2, 3, 4)
    reduce_axes = tuple(range(1, X.ndim))
    feat_size = 1
    for d in Y.shape[1:]:
        feat_size *= d

    YY = jnp.sum(jnp.square(Y), axis=reduce_axes)  # [n]
    XX = jnp.sum(jnp.square(X), axis=reduce_axes)  # [m]
    Yf = Y.reshape(Y.shape[0], -1)
    Xf = X.reshape(X.shape[0], -1)
    YX = Yf @ Xf.T  # [n, m]

    D = YY[:, None] + XX[None, :] - 2.0 * YX
    if compute_mean:
        n, m = D.shape
        D = jnp.sum(D) / (n * m)
        D = D / feat_size
    return D


def manifold_summary(X):
    """(mean vector, mean squared norm) of manifold X [m, ...] — the
    sufficient statistics for the mean-reduced pairwise loss."""
    Xf = jnp.asarray(X).reshape(X.shape[0], -1).astype(jnp.float32)
    return jnp.mean(Xf, axis=0), jnp.mean(jnp.sum(jnp.square(Xf), axis=1))


def l2_mean_loss(Y, x_mean, x_msq, normalize=True):
    """mean_{n,m} ||y_n - x_m||^2 (optionally / feature size) from summary."""
    Yf = Y.reshape(Y.shape[0], -1).astype(jnp.float32)
    val = (jnp.mean(jnp.sum(jnp.square(Yf), axis=1))
           + x_msq
           - 2.0 * jnp.mean(Yf @ x_mean))
    if normalize:
        val = val / Yf.shape[1]
    return val


def disc_softplus_loss(logits):
    """Realism term: mean softplus(-D(x)) (util_latent_aug.py:363-371)."""
    return jnp.mean(jax.nn.softplus(-logits))

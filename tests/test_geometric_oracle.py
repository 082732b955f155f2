"""Numerical parity of GeometricAugment's warps against kornia-semantics
torch oracles (round-2 VERDICT weak #3: property tests alone could not
catch a subtly different affine convention or elastic field).

Reference: augments/geometric_aug.py:101-131 composes K.RandomAffine
(degrees, translate, reflection padding) and K.RandomElasticTransform
(kernel 63, sigma 32, alpha 1); the oracles restate kornia's math in
plain torch (tests/reference_oracles.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentaugment_tpu.augments import geometric_aug as ga
from latentaugment_tpu.ops import grid_sample

import reference_oracles as oracle


def _rand_img(n=2, c=2, h=16, w=16, seed=0):
    return np.random.RandomState(seed).rand(n, c, h, w).astype(np.float32) * 2 - 1


# ----------------------------------------------------------------------------
# grid_sample vs torch F.grid_sample (the substrate both warps stand on)

@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    import torch
    import torch.nn.functional as F

    x = _rand_img(seed=1)
    rs = np.random.RandomState(2)
    # Grid reaching well outside [-1, 1] to exercise the padding modes.
    grid = rs.uniform(-1.7, 1.7, size=(2, 16, 16, 2)).astype(np.float32)

    ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid),
                                  padding_mode=padding_mode,
                                  align_corners=align_corners))
    ref = F.grid_sample(torch.tensor(x), torch.tensor(grid),
                        mode="bilinear", padding_mode=padding_mode,
                        align_corners=align_corners).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


# ----------------------------------------------------------------------------
# Affine: fixed angles/translations through the full kornia pipeline

@pytest.mark.parametrize("angle,trans", [
    ([0.0, 0.0], [[0.0, 0.0], [0.0, 0.0]]),          # identity
    ([3.0, -3.0], [[0.0, 0.0], [0.0, 0.0]]),         # pure rotation
    ([0.0, 0.0], [[2.0, -1.0], [-0.8, 0.5]]),        # pure translation
    ([5.0, -2.5], [[1.2, -0.7], [-2.0, 1.5]]),       # both
])
def test_affine_warp_matches_kornia(angle, trans):
    x = _rand_img(seed=3)
    ours = np.asarray(ga.affine_warp(jnp.asarray(x),
                                     jnp.asarray(angle, jnp.float32),
                                     jnp.asarray(trans, jnp.float32)))
    ref = oracle.kornia_affine_oracle(x, angle, trans).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_affine_rotation_direction_pins_sign():
    """A wrong angle sign would still pass symmetric-distribution property
    tests (RandomAffine draws from the symmetric [-deg, +deg], so the
    AUGMENTATION distribution is sign-invariant); this pins the
    deterministic convention so a refactor cannot silently flip it.

    Convention pinned: kornia's get_affine_matrix2d passes -angle into
    get_rotation_matrix2d (the documented RandomAffine quirk), so +90 deg
    is VISUALLY CLOCKWISE in image coords — a pixel north of center lands
    EAST. (kornia.geometry.rotate, without the negation, would put it
    west.) One-sided assertions: east bright AND west empty."""
    x = np.zeros((1, 1, 9, 9), np.float32)
    x[0, 0, 1, 4] = 1.0  # north of center
    ours = np.asarray(ga.affine_warp(jnp.asarray(x),
                                     jnp.asarray([90.0], jnp.float32),
                                     jnp.zeros((1, 2), jnp.float32)))
    ref = oracle.kornia_affine_oracle(x, [90.0], [[0.0, 0.0]]).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    assert ref[0, 0].max() > 0.5  # the pixel survived the warp
    assert ours[0, 0, 4, 7] > 0.5, "north pixel must land EAST at +90deg"
    assert ours[0, 0, 4, 1] < 0.1, "west must stay empty (sign flipped?)"
    assert ours[0, 0, 1, 4] < 0.1, "pixel must actually move"


# ----------------------------------------------------------------------------
# Elastic: fixed noise field through the full kornia pipeline

@pytest.mark.parametrize("kernel_size,sigma,alpha", [
    (9, 3.0, 1.0),
    (63, 32.0, 1.0),   # kornia defaults (kernel larger than the image)
    (9, 3.0, 0.25),
])
def test_elastic_warp_matches_kornia(kernel_size, sigma, alpha):
    x = _rand_img(seed=4)
    rs = np.random.RandomState(5)
    noise = rs.uniform(-1, 1, size=(2, 2, 16, 16)).astype(np.float32)
    ours = np.asarray(ga.elastic_warp(jnp.asarray(x), jnp.asarray(noise),
                                      kernel_size=kernel_size, sigma=sigma,
                                      alpha=alpha))
    ref = oracle.kornia_elastic_oracle(x, noise, kernel_size=kernel_size,
                                       sigma=sigma, alpha=alpha).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_random_paths_use_oracle_semantics():
    """The random wrappers (p=1) must agree with the deterministic cores
    given the parameters they sampled — guards against the wrapper
    re-deriving different conventions (e.g. normalized translations)."""
    x = jnp.asarray(_rand_img(seed=6))
    key = jax.random.PRNGKey(0)

    n, _, h, w = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    degrees, translate = 3.0, 0.05
    angle = jax.random.uniform(k1, (n,), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(k2, (n,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k3, (n,), minval=-translate, maxval=translate) * h
    expect = ga.affine_warp(x, angle, jnp.stack([tx, ty], axis=-1))
    got = ga.random_affine(key, x, 1.0, degrees, translate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)

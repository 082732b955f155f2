"""Geometric-augment property tests (parity: kornia semantics the
reference composes, geometric_aug.py:101-131).

Closed-form invariants that pin the grid_sample conventions: p=0 is
identity everywhere, a p=1 flip is an involution, zero-parameter affine
and zero-alpha elastic are (near-)identities, and rotation moves energy
without creating it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from latentaugment_tpu.augments.geometric_aug import (
    random_affine, random_elastic, random_hflip,
)


@pytest.fixture()
def x():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.rand(4, 2, 16, 16).astype(np.float32) * 2 - 1)


KEY = jax.random.PRNGKey(7)


def test_p_zero_is_identity(x):
    np.testing.assert_array_equal(np.asarray(random_hflip(KEY, x, 0.0)),
                                  np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(random_affine(KEY, x, 0.0, degrees=30.0, translate=0.1)),
        np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(random_elastic(KEY, x, 0.0, kernel_size=7, sigma=2.0)),
        np.asarray(x))


def test_flip_p1_is_involution(x):
    once = random_hflip(KEY, x, 1.0)
    twice = random_hflip(jax.random.PRNGKey(8), once, 1.0)
    assert np.abs(np.asarray(once) - np.asarray(x)).max() > 0.1  # it flipped
    np.testing.assert_array_equal(np.asarray(twice), np.asarray(x))


def test_affine_zero_params_is_identity(x):
    out = random_affine(KEY, x, 1.0, degrees=0.0, translate=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


def test_elastic_zero_alpha_is_zero_displacement_resample(x):
    """kornia's elastic transform is NOT exactly identity at alpha=0: its
    create_meshgrid uses linspace(-1, 1) (align_corners=True spacing) but
    samples with align_corners=False — a half-pixel-scale resample quirk we
    reproduce for parity. Pin alpha=0 to the oracle's zero-displacement
    warp instead of the identity."""
    import reference_oracles as oracle

    out = random_elastic(KEY, x, 1.0, kernel_size=7, sigma=2.0, alpha=0.0)
    zero_noise = np.zeros((x.shape[0], 2) + x.shape[2:], np.float32)
    ref = oracle.kornia_elastic_oracle(np.asarray(x), zero_noise,
                                       kernel_size=7, sigma=2.0,
                                       alpha=0.0).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_affine_rotation_moves_but_preserves_range(x):
    out = np.asarray(random_affine(KEY, x, 1.0, degrees=45.0, translate=0.0))
    assert np.abs(out - np.asarray(x)).max() > 0.1
    # Reflection padding + bilinear sampling cannot exceed the input range.
    assert out.min() >= float(jnp.min(x)) - 1e-5
    assert out.max() <= float(jnp.max(x)) + 1e-5


def test_per_sample_independence(x):
    """p=0.5 must gate per SAMPLE, not per batch: across seeds, some
    samples flip while others don't within one batch."""
    mixed = False
    for seed in range(12):
        out = np.asarray(random_hflip(jax.random.PRNGKey(seed), x, 0.5))
        flipped = [bool(np.abs(out[i] - np.asarray(x)[i]).max() > 1e-6)
                   for i in range(x.shape[0])]
        if any(flipped) and not all(flipped):
            mixed = True
            break
    assert mixed, "hflip gate looks batch-global, not per-sample"

"""Chain-timed TPU measurement of BASELINE.json configs #1 and #2.

Round-1 published 176 samples/s (config #1 geometric) and 420 samples/s
(config #2 SG2 sampling b64) using the min-of-5 protocol that the relay
memoization invalidates for sub-100 ms programs (BENCH_NOTES.md round
2). This re-measures both with the dependency-chain protocol.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chain(fn, x0, iters, perturb):
    """Chain-timed: each iteration's input depends on the previous output;
    clock stops after a host fetch."""
    x = x0
    out = fn(x, 0)
    jax.block_until_ready(out)  # warm (compile + first exec)
    t0 = time.time()
    for i in range(iters):
        out = fn(x, i)
        x = perturb(x0, out, i)
    host = np.asarray(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.time() - t0) / iters
    assert np.isfinite(host)
    return dt


def config2_sampling(batch, n_inner=10):
    """In-jit scan chain (z_{i+1} depends on img_i) — one dispatch, so
    per-dispatch relay latency amortizes."""
    from jax import lax

    from latentaugment_tpu import benchmark

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=256, num_epochs=0, crop_size=64, w_lpips=0.0, w_pix=0.0,
        w_latent=0.0, w_disc=0.0)
    bundle = jax.device_put(bundle)

    @jax.jit
    def scan_chain(bundle, z, key):
        def step(z, i):
            img, ws = fns.ganrand(bundle, z, jax.random.fold_in(key, i))
            return z + 1e-3 * jnp.mean(img), jnp.mean(img)
        return lax.scan(step, z, jnp.arange(n_inner))

    z0 = jax.random.normal(jax.random.PRNGKey(0), (batch, g_cfg.z_dim))
    out = scan_chain(bundle, z0, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        out = scan_chain(bundle, z0 + 1e-4 * (rep + 1), jax.random.PRNGKey(2 + rep))
        np.asarray(out[1])
        best = min(best, (time.time() - t0) / n_inner)
    print(f"config2 sampling b{batch}: {best * 1000:.1f} ms/batch "
          f"-> {batch / best:.0f} samples/s (best of 3 chains)")


def config1_geometric(batch=16, n_inner=20):
    """Sub-100ms program: amplify with an in-jit lax.scan chain (one
    dispatch; each scan step's input depends on the previous output) —
    per-dispatch relay latency otherwise dominates."""
    from jax import lax

    from latentaugment_tpu.augments.geometric_aug import (
        random_affine, random_elastic, random_hflip)

    def transform(x, key):
        k1, k2, k3 = jax.random.split(key, 3)
        x = random_hflip(k1, x, 0.5)
        x = random_affine(k2, x, 0.5, degrees=10.0, translate=0.1)
        x = random_elastic(k3, x, 0.5)
        return x

    @jax.jit
    def scan_chain(x, key):
        def step(carry, i):
            x = transform(carry, jax.random.fold_in(key, i))
            return x, jnp.mean(x)
        x, means = lax.scan(step, x, jnp.arange(n_inner))
        return x, means

    x0 = jax.random.normal(jax.random.PRNGKey(0), (batch, 2, 256, 256))
    out = scan_chain(x0, jax.random.PRNGKey(99))
    jax.block_until_ready(out)  # warm
    best = float("inf")
    for rep in range(3):
        t0 = time.time()
        out = scan_chain(x0 + 1e-4 * (rep + 1), jax.random.PRNGKey(100 + rep))
        host = np.asarray(out[1])
        best = min(best, (time.time() - t0) / n_inner)
        assert np.isfinite(host).all()
    print(f"config1 geometric b{batch}: {best * 1000:.1f} ms/batch "
          f"-> {batch / best:.0f} samples/s (best of 3 in-jit "
          f"{n_inner}-step scan chains)")


def config1_parts(batch=16, n_inner=20):
    """Per-transform breakdown of the geometric pipeline."""
    from jax import lax

    from latentaugment_tpu.augments.geometric_aug import (
        random_affine, random_elastic, random_hflip)

    def composed(x, k):
        k1, k2, k3 = jax.random.split(k, 3)
        x = random_hflip(k1, x, 0.5)
        x = random_affine(k2, x, 0.5, degrees=10.0, translate=0.1)
        return random_elastic(k3, x, 0.5)

    variants = {
        "flip": lambda x, k: random_hflip(k, x, 0.5),
        "affine": lambda x, k: random_affine(k, x, 0.5, degrees=10.0,
                                             translate=0.1),
        "elastic": lambda x, k: random_elastic(k, x, 0.5),
        "composed": composed,
    }
    x0 = jax.random.normal(jax.random.PRNGKey(0), (batch, 2, 256, 256))
    for name, tf in variants.items():
        @jax.jit
        def scan_chain(x, key, tf=tf):
            def step(carry, i):
                x = tf(carry, jax.random.fold_in(key, i))
                return x, jnp.mean(x)
            return lax.scan(step, x, jnp.arange(n_inner))

        out = scan_chain(x0, jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        t0 = time.time()
        out = scan_chain(x0 + 1e-4, jax.random.PRNGKey(2))
        np.asarray(out[1])
        dt = (time.time() - t0) / n_inner
        print(f"  {name:8s}: {dt * 1000:.1f} ms/batch")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "geo"):
        config1_geometric()
    if which == "parts":
        config1_parts()
    if which in ("all", "sg2"):
        config2_sampling(8)
        config2_sampling(64)

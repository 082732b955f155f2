"""TPU probe: banded-matmul FIR (MXU) vs shift-add/Pallas blur in D fwd+bwd.

Usage: python scripts/probe_fir_matmul.py [baseline|matmul|walk-baseline|walk-matmul]

Chain-timing protocol per BENCH_NOTES.md: every iteration's input depends
on the previous output; clock stops after a host fetch. Run each variant
in its own process (fresh device) and never concurrently with another
relay compile.
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import importlib  # noqa: E402

upfirdn2d_mod = importlib.import_module("latentaugment_tpu.ops.upfirdn2d")
from latentaugment_tpu.models.stylegan2 import networks  # noqa: E402


def probe_d(batch=32, res=256):
    d_cfg = networks.discriminator_config(
        img_resolution=res, img_channels=2,
        channel_base=32768, channel_max=512,
        mbstd_group_size=4, num_fp16_res=4)
    d_params = networks.discriminator_init(jax.random.PRNGKey(1), d_cfg)
    d_params = jax.device_put(d_params)

    def d_loss(img):
        logits = networks.discriminator_apply(d_params, d_cfg, img)
        return jnp.mean(jax.nn.softplus(-logits))

    grad_fn = jax.jit(jax.value_and_grad(d_loss))

    img = jax.random.normal(jax.random.PRNGKey(0), (batch, 2, res, res))
    t0 = time.time()
    loss, g = grad_fn(img)
    g.block_until_ready()
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    iters = 10
    x = img
    t0 = time.time()
    for i in range(iters):
        loss, g = grad_fn(x)
        x = img + 1e-3 * g + 1e-6 * i
    host = np.asarray(jnp.sum(g))
    dt = (time.time() - t0) / iters
    assert np.isfinite(host)
    print(f"D fwd+bwd (b{batch}, {res}^2): {dt * 1000:.1f} ms/step")


def probe_walk(batch=32, res=256):
    from latentaugment_tpu import benchmark

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(res=res, num_epochs=10)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch_size=batch)
    walk = jax.jit(fns.walk)
    t0 = time.time()
    img, ws, _ = walk(bundle, w0, crop_pos, synth_key)
    img.block_until_ready()
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    # Several short salted chains, min-of: the relay sporadically stalls a
    # SINGLE execution for minutes (BENCH_NOTES.md), which would dominate
    # one long chain's average; independent chains absorb it. Scalar
    # feedback keeps w at [B, 1, w_dim] (ws[-1] is the broadcast
    # [B, num_ws, w_dim] trajectory — feeding it back retraces the walk
    # with a wrong-shaped w), and the salt defeats the relay memo cache.
    def chain(n_iters, salt):
        w = w0 * (1.0 + 1e-6 * salt)
        t0 = time.time()
        for i in range(n_iters):
            img, _, _ = walk(bundle, w, crop_pos, synth_key)
            w = w0 + 1e-4 * jnp.mean(img) + 1e-6 * (1000 * salt + i)
        host = np.asarray(jnp.sum(img))
        assert np.isfinite(host)
        return (time.time() - t0) / n_iters

    times = [chain(3, salt) for salt in range(3)]
    dt = min(times)
    print(f"chains s/batch: {[round(t, 3) for t in times]}", file=sys.stderr)
    print(f"walk (b{batch}, {res}^2, K=10): {dt:.3f} s/batch "
          f"-> {batch / dt:.2f} samples/s")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    if mode.endswith("matmul"):
        upfirdn2d_mod.set_allow_matmul_blur(True)
        print("[matmul-FIR auto ON]", file=sys.stderr)
    if mode.startswith("walk"):
        probe_walk()
    else:
        probe_d()


if __name__ == "__main__":
    main()

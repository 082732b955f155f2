"""TPU probe: chain-timed D fwd+bwd standalone (before/after polyphase FIR).

Usage: python scripts/probe_d_fir.py  (runs on the real TPU via the relay)

Chain-timing protocol per BENCH_NOTES.md round 2: every iteration's input
depends on the previous output; clock stops after a host fetch.
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

from latentaugment_tpu.models.stylegan2 import networks  # noqa: E402


def main():
    res, batch = 256, 32
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


if __name__ == "__main__":
    main()

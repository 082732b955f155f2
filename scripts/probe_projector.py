"""TPU probe: batched W-projection throughput (models/stylegan2/projector).

Times the jitted num_steps-scan descent on a production-size synthetic G
(256², 2 modalities, bf16 top blocks — the walk's operating point) so the
new inversion surface has a measured hardware number next to the walk's.
Chain-timing per BENCH_NOTES.md: min of salted chains, every iteration's
input depending on the previous output, host fetch at the end.

Usage: python scripts/probe_projector.py [batch] [num_steps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentaugment_tpu import benchmark  # noqa: E402
from latentaugment_tpu.models import vgg  # noqa: E402
from latentaugment_tpu.models.stylegan2 import networks, projector  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    g_cfg, _ = benchmark._make_gd_configs(256, 2, 32768, 512, num_fp16_res=4)
    g_params = networks.generator_init(jax.random.PRNGKey(0), g_cfg)
    vgg_params = vgg.init_vgg(jax.random.PRNGKey(1))
    g_params, vgg_params = jax.device_put((g_params, vgg_params))

    w_avg, w_std = projector.w_stats(g_params["mapping"], g_cfg,
                                     jax.random.PRNGKey(2), n_samples=2048)
    project = jax.jit(projector.make_project_fn(g_cfg, num_steps=num_steps))

    target0 = jax.random.uniform(jax.random.PRNGKey(3), (batch, 2, 256, 256),
                                 minval=-1.0, maxval=1.0)

    t0 = time.time()
    w_opt, dists = project(g_params, vgg_params, target0, w_avg, w_std,
                           jax.random.PRNGKey(4))
    w_opt.block_until_ready()
    print(f"compile+first: {time.time() - t0:.1f}s", file=sys.stderr)

    def chain(n_iters, salt):
        target = target0 * (1.0 + 1e-6 * salt)
        t0 = time.time()
        for i in range(n_iters):
            w_opt, dists = project(g_params, vgg_params, target, w_avg,
                                   w_std, jax.random.PRNGKey(100 + i))
            # Dependency: next target perturbed by this result's statistic.
            target = target0 + 1e-4 * jnp.mean(w_opt) + 1e-6 * (salt * 97 + i)
        host = np.asarray(jnp.sum(w_opt))
        assert np.isfinite(host)
        return (time.time() - t0) / n_iters

    times = [chain(2, salt) for salt in range(3)]
    dt = min(times)
    print(f"chains s/batch: {[round(t, 3) for t in times]}", file=sys.stderr)
    per_img = dt / batch
    print(f"projection (b{batch}, 256^2, {num_steps} steps): {dt:.3f} s/batch"
          f" -> {per_img:.3f} s/img; 1000-step-equivalent: "
          f"{per_img * 1000.0 / num_steps:.1f} s/img")


if __name__ == "__main__":
    main()

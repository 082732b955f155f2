"""TPU probe: minimal repro for the G parameter-gradient kernel fault.

probe_train.py found that training phases taking PARAMETER gradients
through the synthesis network (g_main, g_reg) crash the TPU worker at
256² ("kernel fault"), while forward-only-G phases and input-gradient
paths (the walk, the projector) run clean. This strips the repro to
grad(mean(G(z)))) w.r.t. G params — no D, no ADA, no optimizer — and
bisects over resolution / feature knobs to find the faulting kernel
family.

Usage: python scripts/probe_gparam_grad.py [--res 256] [--batch 16]
       [--fp16_res 4] [--channel_max 512] [--flat-only] [--remat 0]
Each config in its own process (a crash poisons the device).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentaugment_tpu.models.stylegan2 import networks  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--batch', type=int, default=16)
    ap.add_argument('--fp16_res', type=int, default=4)
    ap.add_argument('--channel_base', type=int, default=32768)
    ap.add_argument('--channel_max', type=int, default=512)
    ap.add_argument('--mapping-only', action='store_true',
                    help='grad through the mapping net only (sanity)')
    ap.add_argument('--synthesis-only', action='store_true',
                    help='grad w.r.t. synthesis params from fixed ws')
    ap.add_argument('--remat', type=int, default=0)
    args = ap.parse_args()

    g_cfg = networks.generator_config(
        img_resolution=args.res, img_channels=2,
        channel_base=args.channel_base, channel_max=args.channel_max,
        num_mapping_layers=2,
        num_fp16_res=args.fp16_res if args.res >= 64 else 0)
    params = networks.generator_init(jax.random.PRNGKey(1), g_cfg)
    params = jax.device_put(params)
    remat = args.remat if args.remat else False

    print(f"[probe_gparam_grad] backend={jax.default_backend()} "
          f"res={args.res} batch={args.batch} fp16_res={args.fp16_res} "
          f"cmax={args.channel_max} remat={remat} "
          f"mapping_only={args.mapping_only} "
          f"synthesis_only={args.synthesis_only}", file=sys.stderr)

    if args.mapping_only:
        def loss(p, z):
            ws = networks.mapping_apply(p['mapping'], g_cfg, z)
            return jnp.mean(jnp.square(ws))
    elif args.synthesis_only:
        num_ws = g_cfg.num_ws

        def loss(p, z):
            ws = jnp.tile(z[:, None, :], (1, num_ws, 1))
            img = networks.synthesis_apply(p['synthesis'], g_cfg, ws,
                                           noise_mode='const', remat=remat)
            return jnp.mean(jnp.square(img))
    else:
        def loss(p, z):
            ws = networks.mapping_apply(p['mapping'], g_cfg, z)
            img = networks.synthesis_apply(p['synthesis'], g_cfg, ws,
                                           noise_mode='const', remat=remat)
            return jnp.mean(jnp.square(img))

    grad_fn = jax.jit(jax.value_and_grad(loss))
    z = jax.random.normal(jax.random.PRNGKey(0), (args.batch, g_cfg.z_dim))

    t0 = time.time()
    val, g = grad_fn(params, z)
    leaf = jax.tree_util.tree_leaves(g)[0]
    host = np.asarray(jnp.sum(leaf) + val)
    print(f"[probe_gparam_grad] OK value={float(val):.4f} "
          f"compile+first {time.time() - t0:.1f}s", file=sys.stderr)
    assert np.isfinite(host).all()

    # Quick chain timing (3 iterations, input depends on previous output).
    t0 = time.time()
    for i in range(3):
        val, g = grad_fn(params, z + 1e-6 * val)
    _ = np.asarray(jnp.sum(jax.tree_util.tree_leaves(g)[0]) + val)
    print(f"[probe_gparam_grad] 3-iter chain {time.time() - t0:.2f}s",
          file=sys.stderr)
    print("PASS")


if __name__ == '__main__':
    main()

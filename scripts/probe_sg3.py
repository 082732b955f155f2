"""TPU probe: alias-free (StyleGAN3) generator throughput.

Measures the native SG3 family at the product operating point (256²,
full-scale channels) on the real chip, with the same salted
dependency-chain protocol as bench.py (the relay memoizes identical
(executable, inputs) pairs and can ACK block_until_ready early — only a
value-dependent chain ended by a host fetch times real execution).

Modes:
  synth — jitted mapping+synthesis forward (serving-shaped workload).
  walk  — the full K-step LatentAugment walk over the SG3 generator
          (SG2 D + criteria unchanged), i.e. the policy hot path if a
          user brings an alias-free checkpoint.

Usage: python scripts/probe_sg3.py [synth|walk] [--batch N] [--res R]
       [--iters N] [--radial]
Results land in BENCH_NOTES.md (round-4 SG3 section).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latentaugment_tpu import benchmark  # noqa: E402  (sets the jax cache dir)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def chain_time(step, state0, n_iters, salt):
    """Dependency-chain timing: each iteration's input depends on the
    previous output; the clock stops after a host fetch."""
    s = state0 * (1.0 + 1e-6 * salt)
    t0 = time.time()
    out = None
    for i in range(n_iters):
        out = step(s, salt * 1000 + i)
        s = state0 + 1e-4 * jnp.mean(out) + 1e-6 * i
    host = np.asarray(jnp.sum(out))
    dt = time.time() - t0
    assert np.isfinite(host).all()
    return dt


def agreeing_chains(step, state0, iters):
    chains = [chain_time(step, state0, iters, salt=1),
              chain_time(step, state0, iters, salt=2)]
    while len(chains) < 4:
        a, b = sorted(chains)[:2]
        if b <= 1.15 * a:
            break
        print(f"[probe_sg3] chains {sorted(chains)[:2]} disagree >15% "
              "(relay stall?); running another", file=sys.stderr)
        chains.append(chain_time(step, state0, iters, salt=len(chains) + 1))
    return chains


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["synth", "walk"], nargs="?",
                    default="synth")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--radial", action="store_true",
                    help="rotation-equivariant ('-r') config: 1x1 convs, "
                         "double channels, radial down filters")
    ap.add_argument("--remat", default="true",
                    help="walk-mode remat: true/false or an int out_size "
                         "threshold (SG3 canvases are larger than SG2's — "
                         "unchecked b32 residuals can blow HBM)")
    args = ap.parse_args()
    remat = args.remat == "true" if args.remat in ("true", "false") \
        else int(args.remat)

    g_over = {}
    if args.radial:
        g_over = dict(conv_kernel=1, use_radial_filters=True)
    cb = 32768 * (2 if args.radial else 1)
    cm = 512 * (2 if args.radial else 1)

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=args.res, num_epochs=args.k, channel_base=cb, channel_max=cm,
        arch="stylegan3", remat=remat if args.mode == "walk" else False,
        **g_over)
    bundle = jax.device_put(bundle)
    backend = jax.devices()[0].platform
    print(f"[probe_sg3] backend={backend} mode={args.mode} res={args.res} "
          f"batch={args.batch} radial={args.radial} "
          f"num_ws={g_cfg.num_ws}", file=sys.stderr)

    if args.mode == "synth":
        @jax.jit
        def step_fn(bundle, z, key):
            img, _ = fns.ganrand(bundle, z, key)
            return img

        z0 = jax.random.normal(jax.random.PRNGKey(0), (args.batch, g_cfg.z_dim))

        def step(z, i):
            return step_fn(bundle, z, jax.random.PRNGKey(i))

        t0 = time.time()
        step(z0, 0).block_until_ready()
        print(f"[probe_sg3] compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr)
        chains = agreeing_chains(step, z0, args.iters)
        dt = min(chains) / args.iters
        print(f"[probe_sg3] synth chains {[round(c, 3) for c in chains]} -> "
              f"{dt * 1000:.1f} ms/batch = {args.batch / dt:.2f} imgs/s "
              f"(batch {args.batch}, {args.res}²)")
        return

    walk = jax.jit(fns.walk)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, args.batch)

    def step(w, i):
        img, _, _ = walk(bundle, w, crop_pos, jax.random.PRNGKey(i))
        return img

    t0 = time.time()
    step(w0, 0).block_until_ready()
    print(f"[probe_sg3] compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr)
    chains = agreeing_chains(step, w0, args.iters)
    dt = min(chains) / args.iters
    print(f"[probe_sg3] walk chains {[round(c, 3) for c in chains]} -> "
          f"{dt:.3f} s/batch = {args.batch / dt:.2f} augmented samples/s "
          f"(batch {args.batch}, {args.res}², K={args.k})")


if __name__ == "__main__":
    main()

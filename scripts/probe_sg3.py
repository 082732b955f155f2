"""TPU probe: alias-free (StyleGAN3) generator throughput.

Measures the native SG3 family at the product operating point (256²,
full-scale channels) on the real chip, with the same salted
dependency-chain protocol as bench.py (the relay memoizes identical
(executable, inputs) pairs and can ACK block_until_ready early — only a
value-dependent chain ended by a host fetch times real execution).

Modes:
  synth   — jitted mapping+synthesis forward (serving-shaped workload).
  walk    — the full K-step LatentAugment walk over the SG3 generator
            (SG2 D + criteria unchanged), i.e. the policy hot path if a
            user brings an alias-free checkpoint.
  profile — per-phase subtraction profile of the walk (round-4 VERDICT
            weak #3: SG2 got a D-FIR subtraction profile, SG3 had only
            whole-walk numbers): times the full walk, then the walk
            with each loss term removed (disc / lpips / pix / latent),
            plus synthesis fwd and fwd+bwd in isolation — the
            differences attribute step time to G-backward (the
            filtered_lrelu chains), D, and VGG.

--fp16-res N sets the generator's bf16 plan width (default 4; 99 =
full-bf16 trunk) — the unmeasured b32 memory lever after the remat
probes died.

Usage: python scripts/probe_sg3.py [synth|walk|profile] [--batch N]
       [--res R] [--iters N] [--radial] [--remat X] [--fp16-res N]
Results land in BENCH_NOTES.md (round-4/5 SG3 sections).
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


def profile_mode(args, cb, cm, g_over, remat):
    """Subtraction profile: time the full walk and ablated variants in
    ONE process (shared relay session, serialized measurements). Each
    variant is a separate compile; OOM-risky points should still go
    through fresh processes (this mode sticks to the known-clean b16)."""
    variants = [
        ("walk_full", {}),
        ("walk_no_disc", dict(w_disc=0.0)),
        ("walk_no_lpips", dict(w_lpips=0.0)),
        ("walk_no_pix", dict(w_pix=0.0)),
        ("walk_no_latent", dict(w_latent=0.0)),
    ]
    rows = []
    for name, over in variants:
        fns, bundle, g_cfg = benchmark.build_synthetic_setup(
            res=args.res, num_epochs=args.k, channel_base=cb,
            channel_max=cm, arch="stylegan3", remat=remat,
            crop_size=args.crop, num_fp16_res=args.fp16_res,
            **g_over, **over)
        bundle = jax.device_put(bundle)
        walk = jax.jit(fns.walk)
        w0, crop_pos, _ = benchmark.example_walk_args(g_cfg, args.batch)

        def step(w, i, walk=walk, bundle=bundle, crop_pos=crop_pos):
            img, _, _ = walk(bundle, w, crop_pos, jax.random.PRNGKey(i))
            return img

        t0 = time.time()
        step(w0, 0).block_until_ready()
        compile_s = time.time() - t0
        chains = agreeing_chains(step, w0, args.iters)
        dt = min(chains) / args.iters
        rows.append((name, dt, chains, compile_s))
        print(f"[probe_sg3] {name}: {dt:.3f} s/batch "
              f"(chains {[round(c, 3) for c in chains]}, "
              f"compile {compile_s:.1f}s)", flush=True)

    # Synthesis alone, fwd and fwd+bwd — isolates the G/filtered_lrelu
    # share of the walk step (everything minus D, VGG, loss algebra).
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=args.res, num_epochs=args.k, channel_base=cb, channel_max=cm,
        arch="stylegan3", remat=remat, crop_size=args.crop,
        num_fp16_res=args.fp16_res, **g_over)
    bundle = jax.device_put(bundle)
    num_ws = g_cfg.num_ws

    @jax.jit
    def synth_fwd(bundle, w):
        # w: [N, 1, w_dim] (walk-space latents; example_walk_args)
        ws = jnp.repeat(w, num_ws, axis=1)
        return fns.synthesize(bundle, ws, jax.random.PRNGKey(0))

    @jax.jit
    def synth_fwdbwd(bundle, w):
        def f(w):
            ws = jnp.repeat(w, num_ws, axis=1)
            return jnp.sum(fns.synthesize(bundle, ws,
                                          jax.random.PRNGKey(0)))
        return jax.grad(f)(w)

    w0, _, _ = benchmark.example_walk_args(g_cfg, args.batch)
    for name, fn in (("synth_fwd", synth_fwd), ("synth_fwdbwd",
                                                synth_fwdbwd)):
        def step(w, i, fn=fn):
            return fn(bundle, w + 1e-6 * i)

        t0 = time.time()
        step(w0, 0).block_until_ready()
        compile_s = time.time() - t0
        chains = agreeing_chains(step, w0, args.iters)
        dt = min(chains) / args.iters
        rows.append((name, dt, chains, compile_s))
        print(f"[probe_sg3] {name}: {dt * 1000:.1f} ms/batch "
              f"(chains {[round(c, 3) for c in chains]}, "
              f"compile {compile_s:.1f}s)", flush=True)

    full = dict((n, d) for n, d, _, _ in rows)["walk_full"]
    print(f"[probe_sg3] profile summary (batch {args.batch}, "
          f"{args.res}², K={args.k}, remat={remat}, "
          f"fp16_res={args.fp16_res}):")
    for name, dt, chains, compile_s in rows:
        delta = full - dt if name.startswith("walk_no") else float("nan")
        extra = f"  [term cost ~{delta:.3f} s]" if delta == delta else ""
        print(f"  {name:16s} {dt:.3f} s/batch{extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["synth", "walk", "profile"], nargs="?",
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
    ap.add_argument("--crop", type=int, default=64,
                    help="LPIPS crop size (the bench operating point)")
    ap.add_argument("--channel_base", type=int, default=None,
                    help="override channel_base (default: product scale, "
                         "x2 for --radial; small values for CPU smokes)")
    ap.add_argument("--channel_max", type=int, default=None)
    ap.add_argument("--layers", type=int, default=None,
                    help="override num_layers (default 14)")
    ap.add_argument("--fp16-res", type=int, default=4,
                    help="generator num_fp16_res (bf16 plan width; "
                         "values past the layer count = full-bf16 trunk)")
    args = ap.parse_args()
    remat = args.remat == "true" if args.remat in ("true", "false") \
        else int(args.remat)

    g_over = {}
    if args.radial:
        g_over = dict(conv_kernel=1, use_radial_filters=True)
    if args.layers is not None:
        g_over["num_layers"] = args.layers
    cb = args.channel_base or 32768 * (2 if args.radial else 1)
    cm = args.channel_max or 512 * (2 if args.radial else 1)

    if args.mode == "profile":
        return profile_mode(args, cb, cm, g_over, remat)

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=args.res, num_epochs=args.k, channel_base=cb, channel_max=cm,
        arch="stylegan3", remat=remat if args.mode == "walk" else False,
        crop_size=args.crop, num_fp16_res=args.fp16_res, **g_over)
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
              f"(batch {args.batch}, {args.res}²)", flush=True)
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
          f"(batch {args.batch}, {args.res}², K={args.k})", flush=True)


if __name__ == "__main__":
    main()

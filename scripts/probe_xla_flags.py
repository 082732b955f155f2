"""TPU probe: XLA compiler-flag sweep over the chain-timed 256² K=10 walk.

The one untried single-chip perf lever after round 2 (VERDICT #3): per-compile
compiler options are serialized into the relay compile request
(jax.jit(compiler_options=...) -> CompileOptions.env_option_overrides /
ExecutableBuildOptions), so they reach the relay-side compiler even though
local XLA_FLAGS cannot.

Usage:
  python scripts/probe_xla_flags.py                 # full sweep
  python scripts/probe_xla_flags.py --only v_effort_max,v_vmem64
  python scripts/probe_xla_flags.py --iters 5

Protocol per BENCH_NOTES.md: dependency-chain timing (each iteration's input
depends on the previous output) ended by a host fetch; two chains per
variant, best-of reported, both recorded. Each variant is a fresh compile
(compiler options are part of the compile cache key). Results are appended
to /tmp/xla_flag_sweep.jsonl and printed as a table.

Reference counterpart: none (the torch reference has no compiler-flag
tuning surface); this is TPU-native performance work.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from latentaugment_tpu import benchmark  # noqa: E402

# Sweep variants. Values must be strings for env_option_overrides except the
# build-option efforts, which jax forwards natively (float in [-1, 1]).
VARIANTS = {
    # Max exec-time optimization effort: longer compile, better schedules.
    "v_effort_max": {"exec_time_optimization_effort": 1.0},
    # Minimum effort — validity probe: a measurable slowdown here proves the
    # knob behaviorally reaches the relay-side compiler (so neutral results
    # above are genuine, not silently-dropped options).
    "v_effort_min": {"exec_time_optimization_effort": -1.0},
    # Scoped vmem budget for fusions (default ~16 MiB region on v5e);
    # raising it can admit larger elementwise fusions around the convs —
    # exactly our measured gap (inter-conv FIR/bias/demod chains, ~40% of
    # walk step time per BENCH_NOTES round 2).
    "v_vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "v_vmem96": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # Aggressive loop fusion (libtpu knob seen in public TPU configs).
    "v_loopfusion": {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    # Memory-fitting effort: we run close to HBM limits (b48 OOMs).
    "v_memfit_max": {"memory_fitting_effort": 1.0},
    # Combination of the two most plausible winners.
    "v_effort_vmem64": {
        "exec_time_optimization_effort": 1.0,
        "xla_tpu_scoped_vmem_limit_kib": "65536",
    },
}


def run_chain(walk, bundle, w0, crop_pos, n_iters):
    w_i = w0
    t0 = time.time()
    img = None
    for i in range(n_iters):
        keys = jax.random.split(jax.random.PRNGKey(i), 2)
        img, ws, _ = walk(bundle, w_i, crop_pos, keys[0])
        w_i = w0 + 1e-4 * jnp.mean(img) + 1e-6 * i
    host = np.asarray(jnp.sum(img))  # force real completion
    dt = time.time() - t0
    assert np.isfinite(host).all()
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="/tmp/xla_flag_sweep.jsonl")
    args = ap.parse_args()

    res, batch, k = 256, 32, 10
    print(f"[sweep] backend={jax.default_backend()} res={res} batch={batch} "
          f"K={k} iters={args.iters}", file=sys.stderr)

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=res, num_epochs=k, crop_size=64,
        channel_base=32768, channel_max=512)
    bundle = jax.device_put(bundle)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch)

    names = ["baseline"] + list(VARIANTS)
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]

    results = []
    for name in names:
        opts = VARIANTS.get(name)  # None for baseline
        walk = jax.jit(fns.walk, compiler_options=opts)
        t0 = time.time()
        try:
            img, _, _ = walk(bundle, w0, crop_pos, synth_key)
            img.block_until_ready()
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            print(f"[sweep] {name}: COMPILE/EXEC FAILED: {msg}",
                  file=sys.stderr)
            results.append({"variant": name, "opts": opts, "error": msg})
            with open(args.out, "a") as f:
                f.write(json.dumps(results[-1]) + "\n")
            continue
        compile_s = time.time() - t0
        chains = [run_chain(walk, bundle, w0, crop_pos, args.iters)
                  for _ in range(2)]
        per_batch = min(chains) / args.iters
        rec = {
            "variant": name,
            "opts": opts,
            "compile_s": round(compile_s, 1),
            "chains_s": [round(c, 3) for c in chains],
            "s_per_batch": round(per_batch, 4),
            "samples_per_s": round(batch / per_batch, 3),
        }
        results.append(rec)
        print(f"[sweep] {name}: {per_batch:.3f} s/batch "
              f"({batch / per_batch:.2f} samples/s) "
              f"chains={rec['chains_s']} compile={compile_s:.0f}s",
              file=sys.stderr)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")

    ok = [r for r in results if "s_per_batch" in r]
    if ok:
        base = next((r for r in ok if r["variant"] == "baseline"), None)
        print(f"\n{'variant':<20} {'s/batch':>9} {'samples/s':>10} {'vs base':>8}")
        for r in ok:
            rel = (base["s_per_batch"] / r["s_per_batch"]) if base else float("nan")
            print(f"{r['variant']:<20} {r['s_per_batch']:>9.3f} "
                  f"{r['samples_per_s']:>10.2f} {rel:>7.3f}x")


if __name__ == "__main__":
    main()

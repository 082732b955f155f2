"""TPU probe: fused Pallas filtered_lrelu vs the decomposed path.

Round-4 VERDICT missing #2 / next #4: the SG3 family runs
up->bias->lrelu->down as 4 separate XLA ops (each FIR on the
banded-matmul MXU path); ops/filtered_lrelu.py now has a one-kernel
Pallas version (impl='pallas_fused') where the up-rate canvas stays in
VMEM. This probe measures both on REAL layer geometries from the 256²
alias-free plan (salted dependency chains — bench.py protocol) and
prints a per-layer table. Commit the outcome to BENCH_NOTES either way
(same discipline as the SG2 Pallas blur).

Usage: python scripts/probe_flrelu.py [--batch 16] [--res 256]
       [--iters 20] [--layers 4,7,11]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from latentaugment_tpu import benchmark  # noqa: E402  (sets jax cache dir)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from latentaugment_tpu.models.stylegan3 import networks as n3  # noqa: E402
from latentaugment_tpu.ops.filtered_lrelu import filtered_lrelu  # noqa: E402


def chain(step, x0, iters, salt):
    s = x0 * (1.0 + 1e-6 * salt)
    t0 = time.time()
    out = None
    for i in range(iters):
        out = step(s)
        s = x0 + 1e-4 * jnp.mean(out)
    host = np.asarray(jnp.sum(out))
    assert np.isfinite(host).all()
    return time.time() - t0


def best_chains(step, x0, iters):
    times = [chain(step, x0, iters, 1), chain(step, x0, iters, 2)]
    while len(times) < 4 and sorted(times)[1] > 1.15 * sorted(times)[0]:
        times.append(chain(step, x0, iters, len(times) + 1))
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--layers", default="2,5,8,11",
                    help="comma-separated layer indices of the plan")
    args = ap.parse_args()

    benchmark.enable_compile_cache()
    cfg = n3.generator_config(img_resolution=args.res, img_channels=2,
                              channel_base=32768, channel_max=512)
    idxs = [int(s) for s in args.layers.split(",")]
    print(f"[probe_flrelu] backend={jax.default_backend()} "
          f"batch={args.batch} res={args.res}", file=sys.stderr)

    for idx in idxs:
        layer = cfg.layers[idx]
        # The PRODUCTION filter designer (incl. radial down filters for
        # '-r' plans) — a probe-local re-derivation measured the wrong
        # filter for radial layers (review round 5).
        fu, fd = n3._layer_filters(layer)
        fu = jnp.asarray(fu) if fu is not None else None
        fd = jnp.asarray(fd) if fd is not None else None
        c = layer.in_channels
        x0 = jax.random.normal(jax.random.PRNGKey(idx),
                               (args.batch, c, layer.in_size, layer.in_size))
        b = jax.random.normal(jax.random.PRNGKey(100 + idx), (c,)) * 0.1
        pad = (layer.padding[0], layer.padding[1],
               layer.padding[0], layer.padding[1])
        kw = dict(up=layer.up_factor, down=layer.down_factor, padding=pad,
                  gain=np.sqrt(2.0), slope=0.2, clamp=256.0)

        rows = {}
        for impl in ("auto", "pallas_fused", "striped"):
            @jax.jit
            def step(x, impl=impl):
                return filtered_lrelu(x, fu, fd, b, impl=impl, **kw)

            try:
                t0 = time.time()
                y = step(x0)
                y.block_until_ready()
                compile_s = time.time() - t0
                times = best_chains(step, x0, args.iters)
                dt = min(times) / args.iters
                rows[impl] = dt
                print(f"[probe_flrelu] L{idx} ({c}ch {layer.in_size}² "
                      f"up{layer.up_factor} dn{layer.down_factor} "
                      f"taps {layer.up_taps}/{layer.down_taps}) {impl}: "
                      f"{dt * 1000:.2f} ms (chains "
                      f"{[round(t, 3) for t in times]}, "
                      f"compile {compile_s:.1f}s)", flush=True)
            except Exception as e:  # lowering/compile failure is a result
                print(f"[probe_flrelu] L{idx} {impl}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        for name in ("pallas_fused", "striped"):
            if "auto" in rows and name in rows:
                r = rows["auto"] / rows[name]
                print(f"[probe_flrelu] L{idx} {name} speedup x{r:.2f} "
                      f"({name + ' WINS' if r > 1 else 'decomposed wins'})",
                      flush=True)


if __name__ == "__main__":
    main()

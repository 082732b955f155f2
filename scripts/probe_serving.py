"""Serving-edge latency table (round-3 VERDICT #5): measure the bucket
ladder's central design claim on hardware.

examples/serve_generator.py pads every request up to a fixed bucket
ladder so a handful of XLA compiles serve any request size. This probe
measures, per bucket n in the ladder:
  - first-call cost (XLA compile through the export runtime)
  - steady-state latency (median of seed-varied calls — the relay
    memoizes identical inputs, so every call draws fresh z), INCLUDING
    the host fetch of the [n,C,res,res] images (the serving protocol)
and compares the ladder at the top bucket against a direct
exported.call at the same shape (the no-ladder floor). Gate: the
ladder must stay within 2x the direct-apply time at n=top.

The relay rejects oversized HTTP bodies (the exported artifact bakes
weights in as HLO constants), so --channel_base can shrink the model
if the flagship 256² export cannot ship through the tunnel; the JSON
records the config so numbers are never silently incomparable.

TPU:    python scripts/probe_serving.py
Smoke:  python scripts/probe_serving.py --smoke
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_serve_module():
    spec = importlib.util.spec_from_file_location(
        "serve_generator_mod", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "examples", "serve_generator.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--smoke", action="store_true", help="CPU tiny shapes")
    ap.add_argument("--reps", type=int, default=5,
                    help="seed-varied calls per bucket (median reported)")
    ap.add_argument("--channel_base", type=int, default=0,
                    help="override (0 = flagship 32768 on TPU)")
    args = ap.parse_args(argv)

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from latentaugment_tpu import benchmark

    benchmark.enable_compile_cache()

    from latentaugment_tpu.models.stylegan2 import convert, networks
    from scripts.export_model import build_export

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not args.smoke:
        res, channel_base, channel_max = 256, args.channel_base or 32768, 512
        buckets = (1, 2, 4, 8, 16, 32)
        platforms = ("tpu",)
    else:
        res, channel_base, channel_max = 32, args.channel_base or 1024, 64
        buckets = (1, 2, 4, 8)
        platforms = ("cpu",)

    print(f"[serve-probe] backend={jax.default_backend()} res={res} "
          f"channel_base={channel_base} buckets={buckets}", file=sys.stderr)

    d = tempfile.mkdtemp(prefix="lataug_serve_probe_")
    ckpt = os.path.join(d, "ckpt.pkl")
    g_cfg = networks.generator_config(
        img_resolution=res, img_channels=2, channel_base=channel_base,
        channel_max=channel_max, num_mapping_layers=2,
        num_fp16_res=4 if res >= 64 else 0)
    d_cfg = networks.discriminator_config(
        img_resolution=res, img_channels=2, channel_base=512,
        channel_max=16)  # tiny D: the serving probe only exports G
    key = jax.random.PRNGKey(0)
    convert.save_checkpoint(
        ckpt, networks.generator_init(key, g_cfg), g_cfg,
        networks.discriminator_init(key, d_cfg), d_cfg)

    art = os.path.join(d, "g.stablehlo")
    t0 = time.time()
    blob = build_export(ckpt, which="g", platforms=platforms).serialize()
    with open(art, "wb") as f:
        f.write(blob)
    print(f"[serve-probe] export: {len(blob) / 1e6:.1f} MB in "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    mod = _load_serve_module()
    svc = mod.GeneratorService(art, buckets=buckets)

    table = {}
    for n in buckets:
        t0 = time.time()
        svc.generate(n, seed=10_000 + n)  # first call: compile
        first = time.time() - t0
        lats = []
        for r in range(args.reps):
            t0 = time.time()
            imgs = svc.generate(n, seed=100 * n + r)  # fresh z each call
            lats.append(time.time() - t0)
            assert imgs.shape == (n, 2, res, res)
        table[n] = dict(first_call_s=round(first, 3),
                        median_s=round(float(np.median(lats)), 4),
                        per_img_ms=round(1e3 * float(np.median(lats)) / n, 2))
        print(f"[serve-probe] bucket {n:3d}: first {first:7.2f}s  "
              f"median {table[n]['median_s']:.4f}s  "
              f"({table[n]['per_img_ms']:.1f} ms/img)", file=sys.stderr)

    # Direct-apply floor at the top bucket: exported.call without the
    # ladder (same fetch), fresh z per rep.
    top = buckets[-1]
    rng = np.random.RandomState(7)
    direct = []
    # np.asarray SYNCHRONIZES the warmup — a discarded async result would
    # still be in flight on the serialized relay when the first timed rep
    # dispatches, inflating direct[0] (round-4 review).
    np.asarray(svc.exported.call(
        rng.randn(top, svc.z_dim).astype(np.float32)))
    for r in range(args.reps):
        z = rng.randn(top, svc.z_dim).astype(np.float32)
        t0 = time.time()
        out = np.asarray(svc.exported.call(z))
        direct.append(time.time() - t0)
        assert out.shape == (top, 2, res, res)
    direct_s = float(np.median(direct))
    ratio = table[top]["median_s"] / direct_s
    print(f"[serve-probe] direct apply n={top}: {direct_s:.4f}s; "
          f"ladder/direct = {ratio:.3f}", file=sys.stderr)

    out = {
        "metric": "serving_bucket_ladder",
        "unit": "s/request",
        "res": res, "channel_base": channel_base,
        "artifact_mb": round(len(blob) / 1e6, 1),
        "buckets": {str(k): v for k, v in table.items()},
        "direct_apply_top_s": round(direct_s, 4),
        "ladder_over_direct": round(ratio, 3),
    }
    print(json.dumps(out))
    assert ratio < 2.0, (
        f"bucket ladder is {ratio:.2f}x the direct-apply time at "
        f"n={top} — the ladder's padding/dispatch overhead broke its "
        "design contract")
    return out


if __name__ == "__main__":
    main()

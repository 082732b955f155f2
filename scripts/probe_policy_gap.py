"""Decompose the policy-path throughput gap (round-3 VERDICT #4).

`bench.py --policy` (the public set_input -> forward -> get_output
protocol, the reference's own throughput protocol at
backbone_latentaug.py:123-124) measured ~11.1 samples/s vs 13.5 for the
jitted walk alone. BENCH_NOTES attributed the ~17% gap to relay
transport (forward fetches the full augmented image batch to host);
this probe MEASURES it instead of asserting it:

  scalar    — chain-timed walk, scalar-checksum fetch only (the walk
              bench protocol: no payload leaves the device)
  fetch     — identical chain, but every iteration fetches the full
              [B,2,res,res] f32 image batch host-side (the policy's
              forward() does exactly this, latent_aug.py `np.asarray`)
  roundtrip — `fetch` + every iteration's w input dispatched from a
              fresh HOST numpy array (the policy feeds numpy w codes
              each batch -> implicit device_put upload)
  policy    — the public protocol itself (benchmark.run_policy_bench)

Per-batch decomposition printed as a table:
  transport_down = fetch - scalar        (bytes-accounted -> MB/s)
  transport_up   = roundtrip - fetch
  host_residual  = policy - roundtrip    (zip reads, concat, slicing)
If host_residual exceeds ~3% of the policy time, something other than
transport is being paid and needs fixing.

TPU:    python scripts/probe_policy_gap.py
Smoke:  python scripts/probe_policy_gap.py --smoke   (CPU, tiny shapes)
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_times(walk, bundle, w0, crop_pos, iters, salt, mode):
    """One salted dependency chain (the only reliable relay timing —
    CLAUDE.md round-2 protocol); returns seconds for `iters` steps.

    mode: 'scalar' fetches a checksum only; 'fetch' materializes the
    full image batch each iteration; 'roundtrip' additionally feeds the
    next iteration's w from a HOST numpy array (upload leg included).
    """
    import jax
    import jax.numpy as jnp

    w_i = w0 * (1.0 + 1e-6 * salt)
    img = None
    t0 = time.time()
    for i in range(iters):
        keys = jax.random.split(jax.random.PRNGKey(1000 * salt + i), 2)
        img, ws, _ = walk(bundle, w_i, crop_pos, keys[0])
        if mode == "fetch":
            # Full host materialization (what the policy's forward
            # pays): np.asarray blocks until the bytes are on host, so
            # the download lands in the timed loop — but the NEXT input
            # is derived ON DEVICE exactly as scalar mode does, so fetch
            # adds ONLY the download leg. (Deriving the next w from the
            # host value would re-upload it at dispatch, folding the
            # upload into this mode too and making roundtrip-fetch
            # structurally ~0 — the round-4 review caught that.)
            host_img = np.asarray(img)
            assert np.isfinite(host_img[0, 0, 0, 0])
        if mode == "roundtrip":
            # Download AND re-derive the next input from the HOST value:
            # the fresh numpy array is uploaded by the implicit
            # device_put at dispatch (the policy feeds numpy w codes
            # each batch). roundtrip - fetch isolates the upload leg.
            host_img = np.asarray(img)
            w_i = np.asarray(w0) + np.float32(
                1e-4 * host_img.mean() + 1e-6 * i)
        else:
            w_i = w0 + 1e-4 * jnp.mean(img) + 1e-6 * i
    if mode == "scalar":
        host = np.asarray(jnp.sum(img))  # force completion
        assert np.isfinite(host).all()
    return time.time() - t0


def best_agreeing(run, max_chains=4, tol=1.15):
    """Run salted chains until the best two agree within tol (relay
    stall rejection, same policy as bench.py); returns (best, all)."""
    chains = [run(salt=1), run(salt=2)]
    while len(chains) < max_chains:
        a, b = sorted(chains)[:2]
        if b <= tol * a:
            break
        print(f"[probe] chains {sorted(chains)[:2]} disagree >15% "
              f"(relay stall?); running another", file=sys.stderr)
        chains.append(run(salt=len(chains) + 1))
    return min(chains), chains


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--smoke", action="store_true", help="CPU tiny shapes")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=0,
                    help="override batch size (default: operating point)")
    args = ap.parse_args(argv)

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from latentaugment_tpu import benchmark

    benchmark.enable_compile_cache()

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not args.smoke:
        res, batch, k = 256, args.batch or 32, 10
        channel_base, channel_max, crop = 32768, 512, 64
    else:
        res, batch, k = 32, args.batch or 8, 3
        channel_base, channel_max, crop = 1024, 64, 16
    iters = args.iters

    print(f"[probe] backend={jax.default_backend()} res={res} "
          f"batch={batch} K={k} iters={iters}", file=sys.stderr)
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=res, num_epochs=k, crop_size=crop,
        channel_base=channel_base, channel_max=channel_max)
    bundle = jax.device_put(bundle)
    walk = jax.jit(fns.walk)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch)

    # Warm every dispatch path once (compile + relay first-exec).
    t0 = time.time()
    chain_times(walk, bundle, w0, crop_pos, 1, 97, "scalar")
    chain_times(walk, bundle, w0, crop_pos, 1, 98, "fetch")
    chain_times(walk, bundle, w0, crop_pos, 1, 99, "roundtrip")
    print(f"[probe] warmup (3 modes): {time.time() - t0:.1f}s",
          file=sys.stderr)

    rows = {}
    for mode in ("scalar", "fetch", "roundtrip"):
        best, chains = best_agreeing(
            lambda salt, m=mode: chain_times(
                walk, bundle, w0, crop_pos, iters, salt, m))
        rows[mode] = best / iters
        print(f"[probe] {mode}: chains "
              f"{[round(c, 3) for c in chains]} -> "
              f"{rows[mode]:.3f} s/batch", file=sys.stderr)

    # The public protocol at the same shapes (fresh workspace on disk).
    root = tempfile.mkdtemp(prefix="lataug_gap_")
    try:
        argv_pol = benchmark.build_policy_workspace(
            root, res=res, batch_size=batch, num_epochs=k, crop_size=crop,
            channel_base=channel_base, channel_max=channel_max,
            n_patients=4, slices_per_patient=max(24, batch))
        times, batch_used, phases = benchmark.run_policy_bench(
            argv_pol, n_batches=4 if on_tpu else 3)
        rows["policy"] = float(np.mean(times))
        print(f"[probe] policy: per-batch {[round(t, 3) for t in times]}; "
              f"phases {[[round(p, 3) for p in ph] for ph in phases]}",
              file=sys.stderr)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    img_mb = batch * 2 * res * res * 4 / 1e6
    down = rows["fetch"] - rows["scalar"]
    up = rows["roundtrip"] - rows["fetch"]
    host = rows["policy"] - rows["roundtrip"]
    out = {
        "metric": "policy_gap_decomposition",
        "unit": "s/batch",
        "batch": batch,
        "res": res,
        "scalar_s": round(rows["scalar"], 4),
        "fetch_s": round(rows["fetch"], 4),
        "roundtrip_s": round(rows["roundtrip"], 4),
        "policy_s": round(rows["policy"], 4),
        "transport_down_s": round(down, 4),
        "transport_down_mb": round(img_mb, 2),
        "transport_down_mbps": round(img_mb / down, 1) if down > 1e-4
        else None,
        "transport_up_s": round(up, 4),
        "host_residual_s": round(host, 4),
        "host_residual_frac": round(host / rows["policy"], 4),
    }
    print(json.dumps(out))
    if host / rows["policy"] > 0.03:
        print(f"[probe] NOTE: host residual "
              f"{100 * host / rows['policy']:.1f}% > 3% — the gap is NOT "
              "all transport; profile set_input/get_output",
              file=sys.stderr)
    return out


if __name__ == "__main__":
    main()

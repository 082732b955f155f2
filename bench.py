"""Benchmark: augmented samples/sec for the full LatentAugment walk.

Measures BASELINE.json config #4 — the multi-objective latent walk
(quality + diversity + proximity + disc), K=10 Adam steps, batch 32,
256x256, 2 modalities, tuned weights (w_lpips=10, w_pix=0.1,
w_latent=0.001, w_disc=0.01) — on the available accelerator, end to end
(walk + final synthesis, device-resident).

vs_baseline: the reference commits no throughput number (BASELINE.md).
We use an analytic single-A5000 estimate: ~7 TFLOPs/sample for the K=10
walk (G fwd+bwd, D fwd+bwd, VGG crops, per step) at ~25% TF32
utilization => ~2.9 samples/sec. Recorded here so successive rounds are
comparable; see BENCH_NOTES.md for the derivation.

Prints result JSON lines {"metric", "value", "unit", "vs_baseline"}: in
the default walk mode, a PROVISIONAL line right after the first timing
chain (flagged "provisional": true) and the final line once chains
agree — so an external timeout mid-protocol still leaves a scrapeable
number; --policy/--train print exactly one line.

Modes: default = the jitted walk (kernel progress); `--policy` = the
public per-batch protocol including host IO; `--train` = the native
StyleGAN2-ADA trainer's full phase schedule (imgs/s vs one V100 running
the torch trainer).
"""

import json
import sys
import time

A5000_BASELINE_SAMPLES_PER_SEC = 2.9
# Trainer mode (--train): NVIDIA's stylegan2-ada README puts paper256 at
# ~12.9 s/kimg on 8xV100 => ~100 s/kimg (10 imgs/s) for one V100 running
# the torch trainer (BENCH_NOTES.md round 3).
V100_TRAIN_IMGS_PER_SEC = 10.0

_WATCHDOG_DONE = None
# Set by the walk-mode protocol once a provisional JSON line has been
# printed: if the watchdog then fires mid-protocol, a number is already
# on stdout, so exit 0 quietly instead of emitting the error JSON.
_PROVISIONAL_PRINTED = False


def _start_watchdog():
    """Self-describing failure instead of an infinite hang.

    The TPU relay can be entirely unavailable (measured: even a trivial
    device_put blocks forever), and the driver runs this bench unattended
    at round end under its OWN external timeout — round 4's driver bench
    was killed with NO output because the in-process watchdog (then
    2700 s) was longer than the driver's timeout. The deadline is now
    time-to-FIRST-result: LATAUG_BENCH_WATCHDOG_S (default 900 s — warm
    cache reaches the first chain result in ~100 s; a cold relay compile
    is 60-500 s) after which, if nothing has been printed, an
    error-describing JSON line goes out (value 0, explicit `error` key:
    not a measurement) and the process exits nonzero. Once a provisional
    result line HAS printed, a later firing exits 0 — the scraper
    already has its number."""
    import os
    import threading

    global _WATCHDOG_DONE
    # Walk mode prints a provisional result at ~100 s (warm), so 900 s
    # to-first-output is safe there; --policy prints its ONLY line at
    # the very end (workspace + compile + 4 batches, relay stalls of
    # 237-706 s observed) and keeps the old 2700 s headroom.
    mode_default = "2700" if ("--policy" in sys.argv
                              or os.environ.get("LATAUG_BENCH_POLICY")
                              or "--train" in sys.argv
                              or os.environ.get("LATAUG_BENCH_TRAIN")) \
        else "900"
    timeout_s = float(os.environ.get("LATAUG_BENCH_WATCHDOG_S",
                                     mode_default))
    if timeout_s <= 0:
        return
    done = threading.Event()
    _WATCHDOG_DONE = done

    # Match the metric name a SUCCESSFUL run of this mode would emit, so
    # scrapers keyed on it attribute the failure to the right benchmark
    # (the backend is unknowable here — the hang IS backend init — so the
    # TPU-shaped name is used; CPU-smoke runs override the watchdog).
    policy = "--policy" in sys.argv or os.environ.get("LATAUG_BENCH_POLICY")
    unit = "samples/s"
    if "--train" in sys.argv or os.environ.get("LATAUG_BENCH_TRAIN"):
        metric, unit = "sg2ada_train_imgs_per_sec_256px", "imgs/s"
    elif policy:
        metric = "policy_samples_per_sec_256px_K10"
    else:
        metric = "augmented_samples_per_sec_256px_K10"
        if "--sg3" in sys.argv or os.environ.get(
                "LATAUG_BENCH_ARCH", "") in ("sg3", "stylegan3"):
            metric = "sg3_" + metric

    def fire():
        if done.wait(timeout_s):
            return
        if _PROVISIONAL_PRINTED:
            print("[bench] watchdog fired after provisional result — "
                  "keeping it as the record", file=sys.stderr)
            os._exit(0)
        print(json.dumps({
            "metric": metric,
            "value": 0.0,
            "unit": unit,
            "vs_baseline": 0.0,
            "error": f"watchdog: no bench result after {timeout_s:.0f}s "
                     "(TPU relay unavailable or stalled) — value is NOT "
                     "a measurement",
        }), flush=True)
        print("[bench] watchdog fired — exiting", file=sys.stderr)
        os._exit(17)

    threading.Thread(target=fire, daemon=True).start()


def _disarm_watchdog():
    if _WATCHDOG_DONE is not None:
        _WATCHDOG_DONE.set()


def main():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("LATAUG_BENCH_FORCE_CPU"):
        # Test hook: run the CPU-smoke path without touching the TPU relay
        # (a single remote compile costs 300-500 s).
        jax.config.update("jax_platforms", "cpu")

    from latentaugment_tpu import benchmark

    # Persistent compilation cache: the 256² K=10 walk is a large XLA
    # program; caching makes repeat bench runs start in seconds.
    benchmark.enable_compile_cache()

    _start_watchdog()  # arm BEFORE the first device contact
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    # --policy / LATAUG_BENCH_POLICY: time the PUBLIC per-batch protocol
    # (set_input -> forward -> get_output: inversion-zip lookups, loader,
    # host<->device transfers) instead of the jitted walk alone — the
    # reference's own throughput protocol (backbone_latentaug.py:123-124).
    if "--train" in sys.argv or os.environ.get("LATAUG_BENCH_TRAIN"):
        return run_train_mode(on_tpu)
    if "--policy" in sys.argv or os.environ.get("LATAUG_BENCH_POLICY"):
        return run_policy_mode(on_tpu)
    # LATAUG_BENCH_ARCH=sg3 (or --sg3): the same K-step walk over the
    # alias-free (StyleGAN3) generator — the driver-capturable lane for
    # the SG3 family (round-4 VERDICT weak #4: SG3 numbers lived only in
    # probe scripts the driver never runs).
    arch = os.environ.get("LATAUG_BENCH_ARCH", "stylegan2")
    if "--sg3" in sys.argv or arch in ("sg3", "stylegan3"):
        arch = "stylegan3"
    sg3 = arch == "stylegan3"
    if on_tpu:
        res, batch, k = 256, 32, 10
        channel_base, channel_max, crop = 32768, 512, 64
        iters = 5
        if sg3:
            # Measured SG3 walk operating point (BENCH_NOTES round 4):
            # b32 compile-OOMs even with per-layer remat; b16 with full
            # remat is the largest clean batch.
            batch, iters = 16, 3
    else:  # CPU fallback keeps the bench runnable anywhere.
        res, batch, k = 32, 8, 3
        channel_base, channel_max, crop = 1024, 64, 16
        iters = 2
        if sg3:
            # The default 14-layer alias-free plan takes minutes just to
            # COMPILE on CPU; the smoke only checks the lane works.
            batch, k = 4, 2
    # Experiment knobs (default operating point when unset).
    batch = int(os.environ.get("LATAUG_BENCH_BATCH", batch))
    remat_env = os.environ.get("LATAUG_BENCH_REMAT")  # '', 'true', or int res
    # SG3: full remat is the measured TPU operating point; on CPU it
    # only multiplies the already-slow smoke, so force it off there.
    remat = (True if on_tpu else False) if sg3 else None
    if remat_env:
        remat = remat_env == "true" if remat_env in ("true", "false") \
            else int(remat_env)
    g_over = {}
    if sg3 and not on_tpu:
        g_over = dict(num_layers=6)

    print(f"[bench] backend={backend} arch={arch} res={res} batch={batch} "
          f"K={k}", file=sys.stderr)

    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=res, num_epochs=k, crop_size=crop, arch=arch,
        channel_base=channel_base, channel_max=channel_max, remat=remat,
        **g_over)
    bundle = jax.device_put(bundle)
    walk = jax.jit(fns.walk)

    requested_batch = batch
    while True:
        w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg, batch)
        t0 = time.time()
        try:
            img, ws, _ = walk(bundle, w0, crop_pos, synth_key)
            img.block_until_ready()
            break
        except Exception as e:  # HBM OOM -> halve the batch and retry
            if batch > 4 and ("hbm" in str(e).lower() or "memory" in str(e).lower()):
                # Retry in a FRESH process: an in-process HBM OOM can
                # leave the device poisoned (subsequent fetches raise
                # UNAVAILABLE — measured, BENCH_NOTES.md round 2), which
                # would kill the in-process retry before it could emit
                # the self-describing fallback JSON.
                import subprocess

                print(f"[bench] batch {batch} OOM; retrying batch "
                      f"{batch // 2} in a fresh process", file=sys.stderr)
                # Forward the CLI args AND pin the arch in the env:
                # a bare re-exec would silently benchmark the default
                # SG2 walk when `--sg3` OOMs (review round 5).
                env = dict(os.environ,
                           LATAUG_BENCH_BATCH=str(batch // 2),
                           LATAUG_BENCH_ARCH=arch,
                           LATAUG_BENCH_OOM_FALLBACK="1")
                _disarm_watchdog()  # the child arms its own
                sys.exit(subprocess.run(
                    [sys.executable, os.path.abspath(__file__)]
                    + sys.argv[1:], env=env).returncode)
            raise
    print(f"[bench] compile+first step: {time.time() - t0:.1f}s", file=sys.stderr)

    # Timing: the relay memoizes identical (executable, inputs) and can
    # report block_until_ready before real completion, so (a) every
    # iteration's input DEPENDS on the previous output (serializes real
    # execution), and (b) the clock stops only after actual device data
    # has been fetched to host.
    import numpy as _np

    def run_chain(n_iters, salt=0):
        # `salt` makes every chain's VALUE stream unique: without it a
        # second chain replays the first's exact (executable, inputs)
        # executions, which the relay can serve from its memo cache —
        # two "agreeing" chains would then both be fake-fast.
        w_i = w0 * (1.0 + 1e-6 * salt)
        t0 = time.time()
        for i in range(n_iters):
            keys = jax.random.split(jax.random.PRNGKey(1000 * salt + i), 2)
            img, ws, _ = walk(bundle, w_i, crop_pos, keys[0])
            w_i = w0 + 1e-4 * jnp.mean(img) + 1e-6 * i
        host = _np.asarray(jnp.sum(img))  # tiny fetch, forces completion
        dt = time.time() - t0
        assert _np.isfinite(host).all()
        return dt

    # NO warm single-batch probe here: it was diagnostic-only and is the
    # measured relay-stall point (237-706 s observed) — round 4's driver
    # bench died inside it before any result line printed. The protocol
    # goes straight to the chains; chain 1 doubles as the warm-up.
    metric = ("augmented_samples_per_sec_256px_K10" if on_tpu
              else "augmented_samples_per_sec_cpu_smoke")
    if sg3:
        metric = "sg3_" + metric
    oom_fallback = (batch != requested_batch
                    or bool(os.environ.get("LATAUG_BENCH_OOM_FALLBACK")))

    def result_row(chains, provisional):
        dt = min(chains) / iters
        sps = batch / dt
        row = {
            "metric": metric,
            "value": round(sps, 3),
            "unit": "samples/s",
            # The A5000 analytic estimate is for the SG2 walk; the SG3
            # lane has no comparable reference point (the reference never
            # ran the policy over SG3) so its vs_baseline stays 0.
            "vs_baseline": round(sps / A5000_BASELINE_SAMPLES_PER_SEC, 3)
                           if on_tpu and not sg3 else 0.0,
            # batch/oom_fallback make the metric point self-describing:
            # if an HBM regression forces the batch down, the JSON says
            # so instead of silently reporting an incomparable number.
            "batch": batch,
            "oom_fallback": oom_fallback,
            "chains_s": [round(c, 3) for c in chains],
        }
        if provisional:
            row["provisional"] = True
        return row

    # Adaptive chains: the relay sporadically stalls a single execution
    # for seconds-to-minutes (measured — BENCH_NOTES.md rounds 2-3); one
    # stalled exec inside the only chain would corrupt the round metric.
    # A PROVISIONAL result line goes out right after chain 1 so an
    # external kill mid-protocol still leaves a scrapeable number
    # (round-4 VERDICT weak #1); then chains run until the best two
    # agree within 15% (the headline is a REPRODUCED time, not a lucky
    # one) or 4 chains have run, and the final line replaces it. ALL
    # chain times are reported (stderr + JSON) so a relay stall is
    # distinguishable from a genuine regression.
    global _PROVISIONAL_PRINTED
    chains = [run_chain(iters, salt=1)]
    print(json.dumps(result_row(chains, provisional=True)), flush=True)
    _PROVISIONAL_PRINTED = True
    chains.append(run_chain(iters, salt=2))
    while len(chains) < 4:
        a, b = sorted(chains)[:2]
        if b <= 1.15 * a:
            break
        print(f"[bench] chains {sorted(chains)[:2]} disagree >15% "
              f"(relay stall?); running another", file=sys.stderr)
        # Supersede the provisional after each extra chain: a scraper
        # that takes the LAST line always gets best-so-far, so a kill
        # mid-protocol never records a single stall-corrupted chain.
        print(json.dumps(result_row(chains, provisional=True)), flush=True)
        chains.append(run_chain(iters, salt=len(chains) + 1))
    print(f"[bench] {iters}-iter chains {[round(c, 3) for c in chains]} "
          f"-> best {min(chains) / iters:.3f}s/batch", file=sys.stderr)
    print(json.dumps(result_row(chains, provisional=False)), flush=True)
    _disarm_watchdog()


def run_train_mode(on_tpu):
    """One JSON line: native StyleGAN2-ADA trainer imgs/s (full phase
    schedule — the checkpoint-producer path the reference defers to
    NVIDIA's external trainer).

    Thin wrapper over scripts/probe_train.py (the state-threaded chain
    protocol, BENCH_NOTES.md round 3) pinned to the measured-safe 256²
    operating point: batch 32 with r1_chunks=2 — unchunked R1 at b32
    compile-OOMs a 16 GB chip, and b8/b16 hit backend kernel faults in
    the G parameter-gradient phases. Runs in a fresh subprocess (the
    poisoned-device guard: an in-process HBM OOM can wedge the relay
    device for this process)."""
    import os
    import subprocess

    root = os.path.dirname(os.path.abspath(__file__))
    probe = os.path.join(root, "scripts", "probe_train.py")
    env = dict(os.environ)
    if on_tpu:
        env.setdefault("LATAUG_PROBE_R1_CHUNKS", "2")
        cmd = [sys.executable, probe, "--batch",
               env.get("LATAUG_BENCH_BATCH", "32")]
    else:
        cmd = [sys.executable, probe, "--smoke", "--batch", "4",
               "--steps", "2"]
    # The thread watchdog's os._exit would ORPHAN the probe child (which
    # would keep occupying the serialized relay); use subprocess.run's
    # timeout instead — it kills the child — and emit the same
    # self-describing failure JSON the watchdog would have.
    _disarm_watchdog()
    timeout_s = float(os.environ.get("LATAUG_BENCH_WATCHDOG_S", "2700"))
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=timeout_s if timeout_s > 0 else None)
    except subprocess.TimeoutExpired:
        # Failure metric name matches what a SUCCESS of this same run
        # would emit (probe_train names it by resolution: 256px on TPU,
        # 32px for the CPU smoke) so scrapers keyed on the metric see
        # one name per mode regardless of outcome.
        print(json.dumps({
            "metric": "sg2ada_train_imgs_per_sec_256px" if on_tpu
                      else "sg2ada_train_imgs_per_sec_32px",
            "value": 0.0, "unit": "imgs/s", "vs_baseline": 0.0,
            "error": f"watchdog: trainer probe produced no result after "
                     f"{timeout_s:.0f}s (TPU relay unavailable or "
                     "stalled) — value is NOT a measurement",
        }), flush=True)
        print("[bench --train] probe timed out — exiting", file=sys.stderr)
        raise SystemExit(17)
    sys.stderr.write(out.stderr)
    if out.returncode != 0:
        sys.stderr.write(out.stdout)
        raise SystemExit(out.returncode)
    row = json.loads(out.stdout.strip().splitlines()[-1])
    row["vs_baseline"] = (round(row["value"] / V100_TRAIN_IMGS_PER_SEC, 3)
                          if on_tpu else 0.0)
    print(json.dumps(row))
    _disarm_watchdog()


def run_policy_mode(on_tpu):
    """One JSON line: augmented samples/s through the full policy path."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from latentaugment_tpu import benchmark

    if on_tpu:
        res, batch, k = 256, 32, 10
        channel_base, channel_max, crop = 32768, 512, 64
        n_batches = 4
    else:
        res, batch, k = 32, 8, 3
        channel_base, channel_max, crop = 1024, 64, 16
        n_batches = 3

    root = tempfile.mkdtemp(prefix="lataug_policy_bench_")
    try:
        argv = benchmark.build_policy_workspace(
            root, res=res, batch_size=batch, num_epochs=k,
            crop_size=crop, channel_base=channel_base,
            channel_max=channel_max,
            n_patients=4, slices_per_patient=max(24, batch))
        times, batch, phases = benchmark.run_policy_bench(
            argv, n_batches=n_batches)
        dt = float(np.mean(times))
        sps = batch / dt
        print(f"[bench --policy] per-batch times (first discarded): "
              f"{[round(t, 3) for t in times]}; "
              f"phases [set_input, forward, get_output]: "
              f"{[[round(p, 3) for p in ph] for ph in phases]}",
              file=sys.stderr)
        print(json.dumps({
            "metric": "policy_samples_per_sec_256px_K10" if on_tpu
                      else "policy_samples_per_sec_cpu_smoke",
            "value": round(sps, 3),
            "unit": "samples/s",
            "vs_baseline": round(sps / A5000_BASELINE_SAMPLES_PER_SEC, 3)
                           if on_tpu else 0.0,
            "batch": batch,
            "per_batch_s": [round(t, 3) for t in times],
            "phase_s": [[round(p, 3) for p in ph] for ph in phases],
        }))
        _disarm_watchdog()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

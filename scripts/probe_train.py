"""TPU probe: native StyleGAN2-ADA training-step throughput (imgs/s).

Times the full phase schedule of models/stylegan2/train.py — g_main every
step, d_main every step, g_reg every 4, d_reg (R1) every 16, EMA every
step — at the production operating point (256², 2 modalities, ADA 'bgc'
pipe with traced p, bf16 top blocks). This is the checkpoint-*producer*
path the reference defers to NVIDIA's external stylegan2-ada trainer
(reference README.md:55-59); the comparable public number is that
trainer's sec/kimg on datacenter GPUs.

Chain-timing protocol per BENCH_NOTES.md: the train state threads
through every phase step, so N sequential steps form a true dependency
chain (the relay cannot memoize — state differs every call); the clock
stops after a host fetch of a state-dependent scalar. The per-step ADA
rt fetch of the real loop is deliberately OUTSIDE the timed region's
critical path here (p is held fixed) — see --ada-sync to measure it.

Usage: python scripts/probe_train.py [--batch N] [--steps N] [--ada-sync]
Run in its own process; never concurrently with another relay compile.
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

from latentaugment_tpu.models.stylegan2 import networks, train  # noqa: E402


def build(batch, res=256, channels=2, fp16_res=4, remat=False,
          channel_base=32768, channel_max=512, aug='ada'):
    g_cfg = networks.generator_config(
        img_resolution=res, img_channels=channels,
        channel_base=channel_base, channel_max=channel_max,
        num_mapping_layers=2,
        num_fp16_res=fp16_res if res >= 64 else 0)
    d_cfg = networks.discriminator_config(
        img_resolution=res, img_channels=channels,
        channel_base=channel_base, channel_max=channel_max,
        num_fp16_res=fp16_res if res >= 64 else 0)
    cfg = train.train_config(
        batch_size=batch, remat=remat, aug=aug,
        pl_batch_shrink=int(os.environ.get('LATAUG_PROBE_PL_SHRINK', '2')),
        r1_chunks=int(os.environ.get('LATAUG_PROBE_R1_CHUNKS', '1')))
    fns = train.make_train_fns(g_cfg, d_cfg, cfg)
    state = fns.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state)
    return fns, state, g_cfg, cfg


def run_steps(fns, state, g_cfg, cfg, n_steps, batch, salt, ada_sync):
    """One timed chain of n_steps full schedule steps. Returns (dt, state)."""
    phases = os.environ.get('LATAUG_PROBE_PHASES',
                            'g_main,g_reg,d_main,d_reg,ema').split(',')
    # Isolated-phase probing: run the phase EVERY step (the schedule's
    # reg intervals would otherwise dilute the per-step time).
    every_step = len(phases) == 1
    key = jax.random.PRNGKey(7000 + salt)
    p = jnp.float32(0.12)  # representative mid-training ADA p
    rt = 0.0
    t0 = time.time()
    for i in range(n_steps):
        key, kz, kz2, k1, k2, k3, k4, kr = jax.random.split(key, 8)
        z = jax.random.normal(kz, (batch, g_cfg.z_dim))
        z2 = jax.random.normal(kz2, (batch, g_cfg.z_dim))
        real = jax.random.normal(kr, (batch, g_cfg.img_channels,
                                      g_cfg.img_resolution,
                                      g_cfg.img_resolution)) * 0.5
        lg = {}
        if 'g_main' in phases:
            state, lg = fns.g_main(state, z, z2, None, k1, p)
        if 'g_reg' in phases and (every_step or i % cfg.g_reg_interval == 0):
            nb = max(batch // cfg.pl_batch_shrink, 1)
            state, _ = fns.g_reg(state, z[:nb], z2[:nb], None, k2, p)
        if 'd_main' in phases:
            state, lg = fns.d_main(state, real, z, z2, None, k3, p)
        if 'd_reg' in phases and (every_step or i % cfg.d_reg_interval == 0):
            state, _ = fns.d_reg(state, real, None, k4, p)
        if 'ema' in phases:
            state = fns.ema(state, 0.999)
        if ada_sync and 'Progress/rt' in lg and (i + 1) % ada_sync == 0:
            # the real loop's host fetch for the ADA controller: cadence
            # 1 = the old per-step fetch, cfg.ada_interval (4) = the
            # deferred-flush loop (train_loop ada_pending)
            rt = float(lg['Progress/rt'])
    host = np.asarray(jnp.sum(state['pl_mean']) +
                      jnp.sum(state['g']['mapping']['fc0']['weight'][0, :4]))
    dt = time.time() - t0
    assert np.isfinite(host).all(), host
    return dt, state, rt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--steps', type=int, default=16,
                    help='steps per chain (16 = one full d_reg interval)')
    ap.add_argument('--ada-sync', type=int, nargs='?', const=1, default=0,
                    help='fetch rt to host every N steps inside the chain '
                         '(1 = the old per-step loop, 4 = the deferred '
                         'ADA flush, 0/absent = off)')
    ap.add_argument('--remat', type=int, default=0)
    ap.add_argument('--res', type=int, default=256)
    ap.add_argument('--aug', default='ada', choices=['ada', 'noaug'])
    ap.add_argument('--smoke', action='store_true',
                    help='tiny CPU config (32², small channels)')
    args = ap.parse_args()
    if args.smoke:
        jax.config.update('jax_platforms', 'cpu')

    print(f"[probe_train] backend={jax.default_backend()} "
          f"batch={args.batch} steps/chain={args.steps} aug={args.aug} "
          f"ada_sync={args.ada_sync} remat={args.remat} "
          f"phases={os.environ.get('LATAUG_PROBE_PHASES', 'all')}",
          file=sys.stderr)
    if args.smoke:
        fns, state, g_cfg, cfg = build(
            args.batch, res=32, channel_base=1024, channel_max=64)
    else:
        fns, state, g_cfg, cfg = build(
            args.batch, res=args.res, aug=args.aug,
            remat=args.remat if args.remat else False)

    t0 = time.time()
    dt, state, _ = run_steps(fns, state, g_cfg, cfg, 1, args.batch,
                             salt=99, ada_sync=args.ada_sync)
    print(f"[probe_train] compile+first step: {time.time() - t0:.1f}s",
          file=sys.stderr)

    chains = []
    for salt in (1, 2):
        dt, state, _ = run_steps(fns, state, g_cfg, cfg, args.steps,
                                 args.batch, salt, args.ada_sync)
        chains.append(dt)
        print(f"[probe_train] chain salt={salt}: {dt:.2f}s "
              f"({dt / args.steps * 1000:.0f} ms/step)", file=sys.stderr)
    best = min(chains)
    s_per_step = best / args.steps
    imgs_s = args.batch / s_per_step
    sec_per_kimg = 1000.0 / imgs_s
    import json
    print(json.dumps({
        "metric": f"sg2ada_train_imgs_per_sec_{g_cfg.img_resolution}px",
        "value": round(imgs_s, 2),
        "unit": "imgs/s",
        "batch": args.batch,
        "ms_per_step": round(s_per_step * 1000, 1),
        "sec_per_kimg": round(sec_per_kimg, 1),
        "chains_s": [round(c, 2) for c in chains],
        "ada_sync": int(args.ada_sync),
        "aug": args.aug,
        "phases": os.environ.get('LATAUG_PROBE_PHASES', 'all'),
    }))


if __name__ == '__main__':
    main()

"""Train StyleGAN2(-ADA) natively on TPU — the checkpoint *producer* the
reference defers to NVIDIA's external stylegan2-ada trainer (reference
README.md:55-59). Output snapshots are native checkpoints directly
consumable by the policy (`backbone_latentaugment.py --model_dir`), the
projector (`scripts/project_dataset.py --checkpoint`) and the metric
suite, making the whole LatentAugment workflow self-contained:

    python scripts/train_sg2.py --outdir runs/pelvis \\
        --data interim/Pelvis/Pelvis-img.zip \\
        --modalities MR_nonrigid_CT,MR_MR_T2 --resolution 256 \\
        --batch 32 --kimg 25000 --aug ada --augpipe bgc

    python scripts/train_sg2.py --synthetic --kimg 0.05   # smoke demo

Flag names mirror NVIDIA's train.py surface (gamma/kimg/snap/aug/p/
target/augpipe/mirror/resume) so migrating a training recipe is a
rename-free copy; see MIGRATION.md.

TPU operating point (measured, BENCH_NOTES.md round 3): 256² runs at
**batch 32 with --r1_chunks 2** — 1.14 s/step, 28.1 imgs/s, 35.6 s/kimg
on one v5e chip. Batches 8 and 16 CRASH the TPU worker in the G
parameter-gradient phases (backend kernel fault, mapped per-program;
forward-only and input-gradient paths are unaffected), and unchunked
R1 at b32 exceeds 16 GB HBM at compile time.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--outdir', default='./runs/sg2')
    p.add_argument('--data', default=None,
                   help='dataset zip (<split>/<patient>/<slice>.pickle, '
                        '[0,255] floats — dataset_tool output)')
    p.add_argument('--modalities', default='MR_nonrigid_CT,MR_MR_T2')
    p.add_argument('--split', default='train')
    p.add_argument('--resolution', type=int, default=256)
    p.add_argument('--cond', action='store_true',
                   help='conditional training on dataset.json labels')
    p.add_argument('--mirror', action='store_true',
                   help='x-flip dataset amplification')
    p.add_argument('--batch', type=int, default=32)
    p.add_argument('--gamma', default='auto',
                   help='R1 weight; auto = 0.0002*res^2/batch')
    p.add_argument('--kimg', type=float, default=25000)
    p.add_argument('--snap', type=float, default=50,
                   help='snapshot every N kimg')
    p.add_argument('--lr', type=float, default=2.5e-3)
    p.add_argument('--aug', default='ada', choices=['noaug', 'ada', 'fixed'])
    p.add_argument('--p', type=float, default=0.0,
                   help='initial (fixed: constant) augmentation prob')
    p.add_argument('--target', type=float, default=0.6, help='ADA r_t target')
    p.add_argument('--augpipe', default='bgc',
                   choices=['blit', 'geom', 'color', 'noise', 'cutout',
                            'bg', 'bgc', 'bgcfnc'])
    p.add_argument('--fp16_res', type=int, default=4,
                   help='num highest-res blocks in bf16 (0 = fp32)')
    p.add_argument('--remat', type=int, default=0,
                   help='checkpoint blocks with res >= this (0 = off)')
    p.add_argument('--r1_chunks', type=int, default=1,
                   help='compute R1 in N sequential sub-batches (exact; '
                        'bounds the double-backprop HBM peak — use 2 at '
                        '256 res batch 32 on a 16 GB chip)')
    p.add_argument('--metrics', default='none',
                   help='comma list of snapshot-time metrics '
                        '(fid50k_full,pr50k3_full) or "none". NVIDIA\'s '
                        'trainer defaults to fid50k_full; default is none '
                        'here because each evaluation costs ~50k generator '
                        'samples. Requires --data (real statistics).')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--resume', default=None,
                   help='native checkpoint to resume G/D from')
    p.add_argument('--resume-state', default=None, dest='resume_state',
                   help='training-state-*.pkl from an interrupted run: '
                        'continue exactly (raw G/D, EMA, Adam moments, '
                        'ADA controller, RNG, nimg); overrides network '
                        'shape flags with the saved configs')
    p.add_argument('--n_devices', type=int, default=0,
                   help='data-parallel mesh size (0 = single device)')
    p.add_argument('--synthetic', action='store_true',
                   help='train on random data (demo/smoke, 32x32)')
    p.add_argument('--channel_base', type=int, default=32768)
    p.add_argument('--channel_max', type=int, default=512)
    p.add_argument('--map_layers', type=int, default=2,
                   help='mapping depth (NVIDIA auto config uses 2)')
    p.add_argument('--cpu', action='store_true', help='force CPU backend')
    return p


def parse_args(argv=None):
    return build_parser().parse_args(argv)


def _explicit_flags(argv=None):
    """Dests of the flags the user actually typed (defaults suppressed) —
    lets --resume-state restore the saved hyperparameters while explicit
    CLI flags still win."""
    p = build_parser()
    for action in p._actions:
        action.default = argparse.SUPPRESS
    return set(vars(p.parse_args(argv)))


def make_data_iter(args, batch_size, c_dim):
    """Yield (imgs [B,C,H,W] float32 in [-1,1], labels or None) forever."""
    if args.synthetic:
        chans = len(args.modalities.split(','))
        rng = np.random.RandomState(args.seed)

        def it():
            while True:
                imgs = rng.rand(batch_size, chans, args.resolution,
                                args.resolution).astype(np.float32) * 2 - 1
                c = np.eye(c_dim, dtype=np.float32)[
                    rng.randint(0, c_dim, batch_size)] if c_dim else None
                yield imgs, c
        return it(), chans

    from latentaugment_tpu.models.stylegan2.dataset import \
        CustomImageFolderDataset
    from latentaugment_tpu.utils.util_misc import InfiniteSampler
    ds = CustomImageFolderDataset(
        args.data, modalities=args.modalities.split(','), split=args.split,
        resolution=args.resolution, use_labels=args.cond,
        xflip=args.mirror)
    # Every process must feed the SAME global batch stream (train_loop's
    # documented multi-process contract): shard_batch uses device_put's
    # cross-process global semantics, where each rank's devices take
    # their own global rows out of the locally-fed batch. A rank-sharded
    # sampler (rank=process_index) would make every rank feed a
    # DIFFERENT stream, silently dropping all but 1/N of each decoded
    # batch and skewing epoch coverage. Ranks therefore decode the full
    # global batch; the duplicated decode is hidden by the prefetch
    # thread (BENCH_NOTES.md host-decode probe).
    sampler = InfiniteSampler(len(ds), rank=0, num_replicas=1,
                              seed=args.seed)

    def it():
        idx_iter = iter(sampler)
        while True:
            imgs, labels = [], []
            for _ in range(batch_size):
                img, c = ds[next(idx_iter)]
                imgs.append(img.astype(np.float32) / 127.5 - 1.0)
                labels.append(c)
            c = np.stack(labels).astype(np.float32) \
                if args.cond and labels[0] is not None and \
                np.asarray(labels[0]).size else None
            yield np.stack(imgs), c
    return it(), ds


def resolve_train_cfg(train, args, resume_state, argv=None):
    """Build the train_config. --resume-state restores the SAVED
    hyperparameters (r1_chunks, gamma, aug mode, remat, ...); explicit
    CLI flags still override, each with a loud warning, because an
    un-restored train_config silently breaks the "exact continuation"
    contract (e.g. the r1_chunks=1 default compile-OOMs the 256² b32
    run that was trained with --r1_chunks 2, and aug='ada' would
    overwrite a restored fixed p on the controller's first tick)."""
    cfg_kwargs = dict(
        batch_size=args.batch, lr=args.lr,
        r1_gamma=None if args.gamma == 'auto' else float(args.gamma),
        aug=args.aug, aug_pipe=args.augpipe, ada_target=args.target,
        aug_p=args.p, remat=args.remat if args.remat else False,
        r1_chunks=args.r1_chunks)
    if resume_state is None:
        return train.train_config(**cfg_kwargs)
    saved_cfg = dict(resume_state.get('train_cfg') or {})
    flag_to_cfg = dict(batch='batch_size', lr='lr', gamma='r1_gamma',
                       aug='aug', augpipe='aug_pipe',
                       target='ada_target', p='aug_p', remat='remat',
                       r1_chunks='r1_chunks')
    explicit = _explicit_flags(argv)
    for flag, ck in flag_to_cfg.items():
        if flag in explicit:
            if ck in saved_cfg and saved_cfg[ck] != cfg_kwargs[ck]:
                print(f'[train_sg2] WARNING: --{flag} overrides saved '
                      f'{ck}={saved_cfg[ck]!r} -> {cfg_kwargs[ck]!r}; '
                      'continuation is no longer exact')
            saved_cfg[ck] = cfg_kwargs[ck]
    return train.train_config(**saved_cfg)


def main(argv=None):
    args = parse_args(argv)
    if args.cpu or os.environ.get('LATAUG_TRAIN_FORCE_CPU'):
        # env JAX_PLATFORMS is ignored under the axon sitecustomize;
        # force via config (same pattern as run_pipeline.py).
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    from latentaugment_tpu.models.stylegan2 import convert, networks, train
    from latentaugment_tpu.parallel import mesh as pmesh

    if args.synthetic:
        # Tiny demo operating point (CPU-smokeable in seconds).
        if args.resolution > 32:
            args.resolution = 32
        if args.channel_base == 32768:
            args.channel_base = 1024
        if args.channel_max == 512:
            args.channel_max = 64

    resume_state = None
    if args.resume_state:
        assert not args.resume, '--resume and --resume-state are exclusive'
        resume_state = train.load_training_state(args.resume_state)
    cfg = resolve_train_cfg(train, args, resume_state, argv)

    if resume_state is not None:
        if resume_state['g_cfg'].get('c_dim'):
            args.cond = True  # the restored nets need labels from the iter
        saved_res = int(resume_state['g_cfg'].get('img_resolution',
                                                  args.resolution))
        if args.resolution != saved_res:
            if 'resolution' in _explicit_flags(argv):
                raise SystemExit(
                    f'--resolution {args.resolution} != saved network '
                    f'resolution {saved_res}; a resumed run cannot change '
                    'the architecture')
            args.resolution = saved_res  # data iter must decode to match

    c_dim = 0
    data_iter, ds = make_data_iter(args, cfg.batch_size,
                                   c_dim=2 if args.cond else 0)
    if args.synthetic:
        img_channels = ds
        c_dim = 2 if args.cond else 0
    else:
        img_channels = ds.num_channels
        c_dim = ds.label_dim if args.cond else 0

    if resume_state is not None:
        g_params = d_params = None
        g_cfg = networks.generator_config(**resume_state['g_cfg'])
        d_cfg = networks.discriminator_config(**resume_state['d_cfg'])
    elif args.resume:
        g_params, g_cfg, d_params, d_cfg = convert.load_stylegan(args.resume)
        g_params = jax.tree_util.tree_map(np.asarray, g_params)
        d_params = jax.tree_util.tree_map(np.asarray, d_params)
    else:
        g_params = d_params = None
        g_cfg = networks.generator_config(
            img_resolution=args.resolution, img_channels=img_channels,
            c_dim=c_dim, channel_base=args.channel_base,
            channel_max=args.channel_max,
            num_mapping_layers=args.map_layers,
            num_fp16_res=args.fp16_res if args.resolution >= 64 else 0)
        d_cfg = networks.discriminator_config(
            img_resolution=args.resolution, img_channels=img_channels,
            c_dim=c_dim, channel_base=args.channel_base,
            channel_max=args.channel_max,
            num_fp16_res=args.fp16_res if args.resolution >= 64 else 0)

    mesh = None
    if args.n_devices and args.n_devices > 1:
        mesh = pmesh.get_mesh(args.n_devices)
        assert cfg.batch_size % args.n_devices == 0, \
            '--n_devices must divide the batch size'

    state = None
    if g_params is not None:
        fns = train.make_train_fns(g_cfg, d_cfg, cfg, mesh=mesh)
        state = fns.state_from_params(g_params, d_params)

    # Snapshot-time metric evaluation (the torch trainer's --metrics:
    # every snapshot is scored against the real dataset and appended to
    # metric-<mode>-<metric>.jsonl in the run dir).
    on_snapshot = None
    metric_names = [m for m in args.metrics.split(',')
                    if m and m != 'none']
    if metric_names:
        if not args.data:
            print('[train_sg2] --metrics needs --data for real-image '
                  'statistics; skipping snapshot metrics')
        else:
            from latentaugment_tpu.metrics import \
                metric_main_mi_multimodal as metric_main
            for m in metric_names:
                assert metric_main.is_valid_metric(m), \
                    (m, metric_main.list_valid_metrics())
            modalities = args.modalities.split(',')
            dataset_kwargs = dict(
                path=args.data, split=args.split, modalities=modalities,
                resolution=args.resolution)

            def on_snapshot(path, snap_state, cur_nimg):
                g_host = jax.tree_util.tree_map(np.asarray,
                                                snap_state['g_ema'])
                for mode_idx, mode in enumerate(modalities):
                    for m in metric_names:
                        # calc_metric runs on EVERY rank (the sharded
                        # feature passes are cross-process collectives);
                        # only process 0 appends to metric-*.jsonl —
                        # same single-writer contract as log.jsonl.
                        res = metric_main.calc_metric(
                            m, G=(g_host, g_cfg),
                            dataset_kwargs=dataset_kwargs,
                            mode_dict=dict(mode_name=mode,
                                           mode_idx=mode_idx),
                            mesh=mesh)
                        if jax.process_index() == 0:
                            metric_main.report_metric(
                                res, mode=mode, run_dir=args.outdir,
                                snapshot_pkl=path)

    gamma_eff = cfg.r1_gamma if cfg.r1_gamma is not None else \
        0.0002 * args.resolution ** 2 / cfg.batch_size
    print(f'[train_sg2] res={args.resolution} ch={img_channels} '
          f'c_dim={c_dim} batch={cfg.batch_size} aug={cfg.aug} '
          f'gamma={gamma_eff:g} mesh={args.n_devices or 1} '
          f'outdir={args.outdir}')
    train.train_loop(g_cfg, d_cfg, data_iter, cfg, total_kimg=args.kimg,
                     run_dir=args.outdir, mesh=mesh, seed=args.seed,
                     snapshot_kimg=args.snap, state=state,
                     on_snapshot=on_snapshot, resume_state=resume_state)
    print('[train_sg2] done')


if __name__ == '__main__':
    main()

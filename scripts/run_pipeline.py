"""One-command demo of the full LatentAugment pipeline (the paper's
evaluation loop): [optionally TRAIN a native StyleGAN2 on the dataset]
-> [optionally invert the dataset to W latents with the native
projector] -> augment a dataset -> dump augmented pairs/latents ->
FID + precision/recall per modality -> UMAP manifold-coverage plot ->
optimization-trajectory GIF.

Chains the same components the reference drives through four separate
scripts (backbone_latentaug.py, analysis/sg2_metrics_analysis.py,
analysis/umap_analysis.py, misc/create_gif.py) — plus the TWO external
NVIDIA prerequisites the reference defers to (reference README.md:55-63):
`--train` runs the native StyleGAN2-ADA trainer (scripts/train_sg2.py)
on the pipeline's dataset zip and feeds its final snapshot forward, and
`--project` runs the TPU-native batched projector
(scripts/project_dataset.py) and feeds its inversion zip to the policy —
so the whole train -> invert -> augment -> score workflow is one
self-contained command.

    python scripts/run_pipeline.py --synthetic            # zero-download demo
    python scripts/run_pipeline.py --synthetic --project  # incl. native inversion
    python scripts/run_pipeline.py --synthetic --train --project  # full loop
    python scripts/run_pipeline.py --dataroot ... --model_dir ...   # real data
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def carry_vgg_env(model_dir):
    """Pin the LPIPS VGG resolved from `model_dir`'s layout into the
    LATENTAUGMENT_VGG16 env var (if not already set) and return it.

    Called BEFORE --train overwrites opt.model_dir with the snapshot
    FILE path: resolve_vgg_path joins 'vgg16_lpips.pkl' onto model_dir,
    which a file path turns into a nonexistent path — the projector and
    the walk would silently fall back to a seeded random-init VGG."""
    import os

    from latentaugment_tpu.augments.engine import resolve_vgg_path

    vgg = resolve_vgg_path(model_dir)
    if vgg and not os.environ.get("LATENTAUGMENT_VGG16"):
        os.environ["LATENTAUGMENT_VGG16"] = vgg
    return vgg


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    def pop_flag(name, default=None, is_bool=False):
        if name in argv:
            i = argv.index(name)
            argv.pop(i)
            return True if is_bool else argv.pop(i)
        return default

    synthetic = pop_flag("--synthetic", False, is_bool=True)
    n_imgs = int(pop_flag("--n_imgs", "32"))
    # --arch stylegan3 builds the synthetic workspace around an
    # alias-free checkpoint: every downstream stage (projector, walk,
    # metrics) dispatches on the checkpoint's saved arch tag.
    arch = pop_flag("--arch", "stylegan2")
    do_train = pop_flag("--train", False, is_bool=True)
    train_kimg = float(pop_flag("--train_kimg", "0.2"))
    train_batch = int(pop_flag("--train_batch", "4"))
    do_project = pop_flag("--project", False, is_bool=True)
    project_steps = int(pop_flag("--project_steps", "100"))
    # 16 is the measured-good TPU operating point (BENCH_NOTES.md round 3).
    project_batch = int(pop_flag("--project_batch", "16"))
    if pop_flag("--cpu", False, is_bool=True) \
            or os.environ.get("LATAUG_PIPELINE_FORCE_CPU"):
        # The axon sitecustomize pins a remote TPU; JAX_PLATFORMS env is
        # ignored there — only the config update works (CLAUDE.md).
        import jax

        jax.config.update("jax_platforms", "cpu")

    if synthetic and do_train and arch != "stylegan2":
        raise SystemExit("--train produces a StyleGAN2 snapshot that would "
                         "replace the --arch checkpoint; drop one of them")
    if synthetic:
        import tempfile

        root = tempfile.mkdtemp(prefix="lataug_pipeline_")
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests"))
        from synthetic import build_workspace

        ws = build_workspace(root, arch=arch)
        argv = ws["argv"] + ["--init_w", "inv", "--p_thres", "0.0",
                             "--w_pix", "0.1", "--w_lpips", "1.0",
                             "--w_latent", "0.001", "--w_disc", "0.01",
                             "--opt_num_epochs", "2", "--verbose_log", "1",
                             "--batch_size", "1",
                             "--name", "pipeline_demo"] + argv

    from latentaugment_tpu.analysis import create_gif, umap_analysis
    from latentaugment_tpu.augments import create_augment
    from latentaugment_tpu.data import create_dataset
    from latentaugment_tpu.metrics.metric_main_mi_multimodal import calc_metric
    from latentaugment_tpu.options import AugOptions
    from latentaugment_tpu.utils import util_general, util_io, util_path

    opt = AugOptions().parse(argv=argv, install_logger=False)
    outdir = os.path.join(opt.checkpoints_dir, opt.name)
    for sub in ("img_aug", "latent_aug", "snap"):
        util_path.create_dir(os.path.join(outdir, sub))

    # ---- Stage -1 (opt-in): native StyleGAN2 training -------------------
    # Trains on the SAME dataset zip the policy augments and hands the
    # final snapshot to every downstream stage — the checkpoint producer
    # the reference defers to NVIDIA's external stylegan2-ada train.py
    # (reference README.md:55-59).
    if do_train:
        import glob

        from scripts.train_sg2 import main as train_main

        train_dir = os.path.join(outdir, "train")
        data_zip = os.path.join(opt.interim_dir, opt.dataset_aug,
                                opt.dataset_name_aug + ".zip")
        train_argv = [
            "--data", data_zip, "--modalities", opt.modalities_aug,
            "--split", opt.phase, "--resolution", str(opt.img_resolution),
            "--outdir", train_dir, "--kimg", str(train_kimg),
            "--batch", str(train_batch), "--snap", str(train_kimg),
        ]
        if synthetic:
            # Workspace-scale tiny nets (seconds per step on CPU).
            train_argv += ["--channel_base", "1024", "--channel_max", "64"]
        print(f"[pipeline] training StyleGAN2 on {data_zip} "
              f"({train_kimg} kimg, batch {train_batch}) -> {train_dir}")
        train_main(train_argv)
        snaps = sorted(glob.glob(
            os.path.join(train_dir, "network-snapshot-*.pkl")))
        assert snaps, f"trainer produced no snapshot under {train_dir}"
        print(f"[pipeline] trained snapshot: {snaps[-1]}")
        # The env var is how both the engine and the projector pick the
        # LPIPS VGG up once model_dir stops being the layout root.
        vgg_from_layout = carry_vgg_env(opt.model_dir)
        if vgg_from_layout:
            print(f"[pipeline] LPIPS VGG carried over from the original "
                  f"model_dir: {vgg_from_layout}")
        opt.model_dir = snaps[-1]  # resolve_stylegan_path takes file paths
        if opt.init_w == "inv" and not do_project:
            print("[pipeline] WARNING: --train replaced the checkpoint but "
                  "--init_w inv will seed the walk from a PRE-EXISTING "
                  "inversion zip that does not match the fresh generator — "
                  "pass --project to re-invert against it")

    # ---- Stage 0 (opt-in): native latent inversion ---------------------
    # Produces the inversion zip the policy's --init_w inv path consumes,
    # in place of the reference's external-NVIDIA-projector prerequisite.
    if do_project:
        from scripts.project_dataset import main as project_main
        from latentaugment_tpu.augments.engine import (
            resolve_stylegan_path, resolve_vgg_path)
        from latentaugment_tpu.utils import util_general

        data_zip = os.path.join(opt.interim_dir, opt.dataset_aug,
                                opt.dataset_name_aug + ".zip")
        # model_dir may be the training-runs ROOT (the engine's normal
        # layout) — resolve to the concrete checkpoint file the same way
        # the engine does, and hand the projector the engine's LPIPS
        # VGG so inversion optimizes the same perceptual space the walk
        # scores (a random-init VGG would silently degrade every seed w).
        ckpt_path = resolve_stylegan_path(
            opt.model_dir, opt.dataset_aug, opt.dataset_name_aug,
            util_general.parse_comma_separated_list(opt.modalities_aug),
            opt.exp_stylegan, opt.network_pkl_stylegan)
        vgg_path = resolve_vgg_path(opt.model_dir)
        proj_w_name = opt.dataset_w_name + "-projected"
        dest_zip = os.path.join(opt.interim_dir, opt.dataset_aug,
                                proj_w_name + ".zip")
        if opt.init_w != "inv":
            print("[pipeline] WARNING: --project requested but --init_w "
                  f"is '{opt.init_w}' — the projected latents will not "
                  "seed the walk (pass --init_w inv)")
        print(f"[pipeline] projecting {data_zip} -> {dest_zip} "
              f"({project_steps} steps, batch {project_batch})")
        project_main([
            "--checkpoint", ckpt_path, "--data_zip", data_zip,
            "--split", opt.phase, "--modalities", opt.modalities_aug,
            "--resolution", str(opt.img_resolution),
            "--num_steps", str(project_steps),
            "--batch_size", str(project_batch),
            "--w_avg_samples", "256" if synthetic else "10000",
            "--outdir", os.path.join(outdir, "temp-projector"),
            "--dest_zip", dest_zip,
        ] + (["--vgg", vgg_path] if vgg_path else []))
        opt.dataset_w_name = proj_w_name  # engine reads interim/<ds>/<name>.zip

    # ---- Stage 1: augment + dump -------------------------------------
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    print(f"[pipeline] augmenting {n_imgs} images "
          f"({len(dataset)} in dataset)")
    n_iter = max(1, n_imgs // opt.batch_size)
    w_in, w_out = [], []
    for i, data in enumerate(dataset):
        if i >= n_iter:
            break
        augment.set_input(data)
        augment.forward()
        out = augment.get_output()
        util_io.write_pickle(out, os.path.join(outdir, "img_aug",
                                               f"img_aug_{i}"))
        # Latents only exist for batches the p_thres gate augmented
        # (a skipped batch has none; forward() cleared the stale ones).
        if getattr(augment, "augmented", False):
            lat = augment.get_latent_output()
            util_io.write_pickle(lat, os.path.join(outdir, "latent_aug",
                                                   f"latent_aug_{i}"))
            # batch-1 outputs are squeezed to [w_dim]; restore the batch dim.
            w_in.append(np.atleast_2d(
                np.asarray(augment.get_latent_input()["w"])))
            w_out.append(np.atleast_2d(np.asarray(lat["w"])))

    # ---- Stage 2: metrics (FID + PR per modality) --------------------
    modalities = util_general.parse_comma_separated_list(opt.modalities_aug)
    dataset_kwargs = dict(
        path=os.path.join(opt.interim_dir, opt.dataset_aug,
                          opt.dataset_name_aug + ".zip"),
        # Real-image statistics come from the SAME split the augmented
        # dumps were produced from (a hardcoded 'train' silently produced
        # cross-split FID/PR when --phase val/test).
        split=opt.phase, modalities=modalities, resolution=opt.img_resolution)
    dataset_kwargs_gen = dict(dataroot=outdir, aug_name=opt.name,
                              batch_size=opt.batch_size)
    results = []
    for mode_idx, mode in enumerate(modalities):
        for metric in ("fid50k_full", "pr50k3_full"):
            res = calc_metric(metric, dataset_kwargs=dataset_kwargs,
                              dataset_kwargs_gen=dataset_kwargs_gen,
                              mode_dict=dict(mode_name=mode,
                                             mode_idx=mode_idx))
            results.append((metric, mode, dict(res.results)))
            print(f"[pipeline] {metric}/{mode}: {dict(res.results)}")
    util_io.write_json(
        [dict(metric=m, mode=mo, results=r) for m, mo, r in results],
        os.path.join(outdir, "pipeline_metrics.json"))

    # ---- Stage 3: UMAP manifold coverage -----------------------------
    umap_path = None
    if w_in:
        w_in = np.concatenate(w_in, axis=0)
        w_out = np.concatenate(w_out, axis=0)
        umap_path = os.path.join(outdir, "umap_coverage.png")
        umap_analysis.manifold_coverage(
            w_in, {"LatentAugment": w_out}, umap_path)
        print(f"[pipeline] UMAP coverage plot: {umap_path}")
    else:
        print("[pipeline] no augmented latents (p_thres gate skipped "
              "every batch); UMAP stage skipped")

    # ---- Stage 4: trajectory GIF (the engine's verbose batch-1 debug
    # walk wrote per-epoch snapshots into its save_dir) ----------------
    engine = getattr(augment, "latent_aug", None)
    snap_dir = getattr(engine, "save_dir", None)
    gifs = []
    if snap_dir and os.path.isdir(snap_dir) and any(
            f.endswith(".png") for f in os.listdir(snap_dir)):
        gifs = create_gif.create_gif(snap_dir)
        print(f"[pipeline] trajectory GIFs: {gifs}")
    else:
        print("[pipeline] no snapshots (run with --verbose_log for GIFs)")

    print(f"[pipeline] DONE — outputs under {outdir}")
    return outdir, results


if __name__ == "__main__":
    main()

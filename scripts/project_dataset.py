"""Invert a paired-image dataset zip to W latents (TPU-native projector).

This plays the role NVIDIA's stylegan2-ada-pytorch ``projector.py`` plays
in the reference workflow (reference README.md:62-63 defers the inversion
step to it): produce one inverted w per slice, written in the exact
``temp-projector/<patient>/<slice>.pickle`` layout the reference's
``data/write_tozip.py`` packages (write_tozip.py:81), so ``--dest_zip``
emits an inversion zip the LatentAugment policy consumes directly
(latent_aug.sample_from_inversion).

TPU-first: projection is batched (one compiled lax.scan descent per
batch, every step a full-batch MXU G fwd+bwd), and the batch axis shards
over a data mesh with ``--n_devices``.

Example:
    python scripts/project_dataset.py \
        --checkpoint ckpt.pkl --data_zip interim/Pelvis/Pelvis-img.zip \
        --split train --num_steps 1000 --batch_size 8 \
        --outdir interim/Pelvis/temp-projector \
        --dest_zip interim/Pelvis/Pelvis-inv.zip
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint", required=True,
                   help="G pickle (NVIDIA persistence or native checkpoint)")
    p.add_argument("--data_zip", required=True,
                   help="paired-image dataset zip (pickle dicts of modalities)")
    p.add_argument("--split", default="train")
    p.add_argument("--modalities", default="MR_nonrigid_CT,MR_MR_T2",
                   help="comma-separated modality keys (policy default)")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--num_steps", type=int, default=1000,
                   help="Adam steps per batch (NVIDIA projector default)")
    p.add_argument("--batch_size", type=int, default=16,
                   help="16 is the measured-good operating point on the "
                        "current TPU toolchain: batches 4-8 at 256² hit a "
                        "backend kernel fault (worker crash) in the composed "
                        "G+VGG program; 2, 3 and 16 are verified (see "
                        "BENCH_NOTES.md round 3)")
    p.add_argument("--initial_lr", type=float, default=0.1)
    p.add_argument("--pix_weight", type=float, default=0.0,
                   help="optional pixel-MSE term on top of the perceptual "
                        "distance (off = NVIDIA semantics)")
    p.add_argument("--w_avg_samples", type=int, default=10000)
    p.add_argument("--num_fp16_res", type=int, default=4,
                   help="bf16 top blocks (runtime knob, engine default)")
    p.add_argument("--remat", action="store_true",
                   help="checkpoint synthesis blocks (larger batches)")
    p.add_argument("--vgg", default=None, help="converted LPIPS VGG16 pickle")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--n_devices", type=int, default=1,
                   help="data-parallel mesh size (batch sharded)")
    p.add_argument("--outdir", default="temp-projector")
    p.add_argument("--dest_zip", default=None,
                   help="also package outdir into an inversion zip "
                        "(write_tozip layout: <split>/<patient>/<slice>.pickle)")
    p.add_argument("--max_items", type=int, default=None,
                   help="cap on slices to invert (smoke runs)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from latentaugment_tpu.augments import manifold
    from latentaugment_tpu.data.write_tozip import write_to_zip
    from latentaugment_tpu.models import vgg
    from latentaugment_tpu.models.stylegan2 import convert, networks, projector
    from latentaugment_tpu.parallel import mesh as mesh_lib
    from latentaugment_tpu.utils import util_general

    modalities = util_general.parse_comma_separated_list(args.modalities)

    g_params, g_cfg, _, _ = convert.load_stylegan(
        args.checkpoint, img_resolution=args.resolution,
        img_channels=len(modalities))
    g_cfg.num_fp16_res = 0 if args.resolution < 64 else args.num_fp16_res
    # Same resolution chain as the walk engine: explicit --vgg, else
    # LATENTAUGMENT_VGG16, else seeded random features (loud warning —
    # inversion would then optimize a different perceptual space than
    # the policy's LPIPS terms score).
    vgg_path = args.vgg or os.environ.get("LATENTAUGMENT_VGG16")
    if not vgg_path:
        print("[project] WARNING: no --vgg / LATENTAUGMENT_VGG16 — "
              "using seeded random VGG features (smoke only)")
    vgg_params = vgg.get_vgg16(path=vgg_path)

    dataset = manifold.ImgDataset(args.data_zip, split=args.split,
                                  modalities=modalities,
                                  resolution=args.resolution)
    n_items = len(dataset)
    if args.max_items is not None:
        n_items = min(n_items, args.max_items)
    print(f"[project] {n_items} slices, split={args.split}, "
          f"batch={args.batch_size}, steps={args.num_steps}")

    key = jax.random.PRNGKey(args.seed)
    stats_key, key = jax.random.split(key)
    w_avg, w_std = projector.w_stats(g_params["mapping"], g_cfg, stats_key,
                                     n_samples=args.w_avg_samples)

    project = projector.make_project_fn(
        g_cfg, num_steps=args.num_steps, initial_lr=args.initial_lr,
        pix_weight=args.pix_weight, remat=args.remat)

    mesh = None
    if args.n_devices > 1:
        mesh = mesh_lib.get_mesh(args.n_devices)
        if args.batch_size % args.n_devices != 0:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"--n_devices {args.n_devices}")
        rep = mesh_lib.replicated(mesh)
        bat = mesh_lib.batch_sharding(mesh)
        project = jax.jit(project,
                          in_shardings=(rep, rep, bat, rep, rep, rep),
                          out_shardings=(bat, rep))
    else:
        project = jax.jit(project)

    os.makedirs(args.outdir, exist_ok=True)
    done = 0
    t_start = time.time()
    while done < n_items:
        idxs = list(range(done, min(done + args.batch_size, n_items)))
        imgs, fnames = [], []
        for i in idxs:
            x, fn = dataset[i]
            imgs.append(x / 127.5 - 1.0)  # zip stores [0,255] (engine conv.)
            fnames.append(fn)
        n_valid = len(imgs)
        while len(imgs) < args.batch_size:  # pad the final partial batch
            imgs.append(imgs[-1])
        target = jnp.asarray(np.stack(imgs), dtype=jnp.float32)

        key, bk = jax.random.split(key)
        t0 = time.time()
        w_opt, dists = project(g_params, vgg_params, target, w_avg, w_std, bk)
        payloads = projector.broadcast_rows(w_opt[:n_valid], g_cfg.num_ws)
        for fn, payload in zip(fnames, payloads):
            parts = fn.split("/")  # <split>/<patient>/<slice>.pickle
            rel = os.path.join(*parts[1:]) if len(parts) > 1 else fn
            dest = os.path.join(args.outdir, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            with open(dest, "wb") as f:
                pickle.dump(payload, f)
        done += n_valid
        print(f"[project] {done}/{n_items} "
              f"(final dist {float(np.asarray(dists)[-1]):.4f}, "
              f"{time.time() - t0:.1f}s/batch)")

    if args.dest_zip:
        patients = sorted(
            d for d in os.listdir(args.outdir)
            if os.path.isdir(os.path.join(args.outdir, d)))
        write_to_zip(args.outdir, args.dest_zip,
                     splits_map={p: args.split for p in patients})
    print(f"[project] done: {done} slices in {time.time() - t_start:.1f}s")


if __name__ == "__main__":
    main()

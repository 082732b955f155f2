"""Synthetic benchmark/dry-run harness: production compute graph, no datasets.

Builds a real-size StyleGAN2 G/D + LPIPS VGG with seeded random weights
and synthetic manifold summaries, then returns the exact jitted latent
walk the LatentAugment engine runs — for throughput benchmarking
(bench.py) and the multichip compile dry-run (__graft_entry__.py).
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from .augments import engine as engine_mod
from .augments import losses, manifold
from .models import vgg
from .models.stylegan2 import networks


def enable_compile_cache(min_compile_secs=1.0):
    """Point this process at the repo's persistent compilation cache
    (.jax_cache next to the repo root).

    jax's cache is opt-in PER PROCESS; every bench/probe/driver entry
    must call this (or pay the 60-500 s relay compile the cache exists
    to avoid). One shared definition — bench.py, __graft_entry__ and
    the probe scripts all ride it, so the path/threshold can never
    drift between them (round-4 review). Returns the cache dir."""
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir


def _make_gd_configs(res, img_channels, channel_base, channel_max,
                     num_fp16_res, mbstd_group_size=4, c_dim=0,
                     arch="stylegan2", **g_over):
    """The bench operating point's G/D configs, shared by the walk-only
    and policy benches so both compile the identical program (and hit
    the same persistent compilation cache).

    bf16 on the top blocks (the reference trains its 256² models with
    num_fp16_res=4) halves the walk's HBM footprint and feeds the MXU at
    its native precision; tiny CPU-smoke resolutions stay fp32."""
    n16 = num_fp16_res if res >= 64 else 0
    from .models import networks_for

    g_cfg = networks_for({"arch": arch}).generator_config(
        c_dim=c_dim, img_resolution=res, img_channels=img_channels,
        channel_base=channel_base, channel_max=channel_max,
        num_fp16_res=n16, **g_over)
    d_cfg = networks.discriminator_config(
        c_dim=c_dim, img_resolution=res, img_channels=img_channels,
        channel_base=channel_base, channel_max=channel_max,
        mbstd_group_size=mbstd_group_size, num_fp16_res=n16)
    return g_cfg, d_cfg


def build_synthetic_setup(res=256, img_channels=2, channel_base=32768,
                          channel_max=512, num_epochs=10, opt_lr=0.01,
                          crop_size=64, w_pix=0.1, w_lpips=10.0,
                          w_latent=0.001, w_disc=0.01, manifold_items=64,
                          num_fp16_res=4, remat=None, seed=0, c_dim=0,
                          arch="stylegan2", **g_over):
    """Returns (fns, bundle, g_cfg) — un-jitted walk fns (taking the bundle
    as first arg) plus the device-state bundle on synthetic weights.

    Defaults mirror the reference's tuned operating point
    (backbone_latentaug.py:46-54): w_lpips=10, w_pix=0.1,
    w_latent=0.001, w_disc=0.01, 256x256, 2 modalities.
    """
    key = jax.random.PRNGKey(seed)
    kg, kd, kv, km = jax.random.split(key, 4)

    g_cfg, d_cfg = _make_gd_configs(res, img_channels, channel_base,
                                    channel_max, num_fp16_res, c_dim=c_dim,
                                    arch=arch, **g_over)
    from .models import networks_for

    g_params = networks_for(g_cfg).generator_init(kg, g_cfg)
    d_params = networks.discriminator_init(kd, d_cfg)
    vgg_params = vgg.init_vgg(kv) if w_lpips > 0 else None

    # Synthetic manifold summaries with the right shapes.
    cc = manifold.center_crop_size(res)
    W_summary = None
    if w_latent > 0:
        W = jax.random.normal(jax.random.fold_in(km, 0),
                              (manifold_items, g_cfg.num_ws, g_cfg.w_dim)) * 0.1
        W_summary = losses.manifold_summary(W)
    X_cc_summaries = None
    if w_pix > 0:
        X_cc_summaries = []
        for m in range(img_channels):
            X = jax.random.uniform(jax.random.fold_in(km, 10 + m),
                                   (manifold_items, 1, cc, cc), minval=-1.0,
                                   maxval=1.0)
            X_cc_summaries.append(losses.manifold_summary(X))
    fea_summaries = None
    if w_lpips > 0:
        # Feature dim from a probe pass.
        probe = jnp.zeros((1, 3, crop_size, crop_size))
        fdim = vgg.lpips_features(vgg_params, probe).shape[1]
        fea_summaries = []
        for m in range(img_channels):
            F = jax.random.normal(jax.random.fold_in(km, 20 + m),
                                  (manifold_items, fdim)) * 0.01
            fea_summaries.append(losses.manifold_summary(F))

    if remat is None:
        # bf16 activations fit unchecked in HBM at batch 32/256²; fp32 needs
        # block remat. Measured: no-remat is ~27% faster when it fits.
        remat = g_cfg.num_fp16_res == 0
    fns = engine_mod.make_walk_fns(
        g_cfg, d_cfg,
        n_modes=img_channels, w_pix=w_pix, w_lpips=w_lpips,
        w_latent=w_latent, w_disc=w_disc,
        num_epochs=num_epochs, opt_lr=opt_lr, crop_size=crop_size,
        remat=remat)
    bundle = engine_mod.make_bundle(
        g_params, d_params, vgg_params, W_summary=W_summary,
        X_cc_summaries=X_cc_summaries, fea_summaries=fea_summaries)
    return fns, bundle, g_cfg


def example_walk_args(g_cfg, batch_size, seed=0):
    key = jax.random.PRNGKey(seed)
    w0 = jax.random.normal(key, (batch_size, 1, g_cfg.w_dim)) * 0.1
    crop_pos = jnp.asarray([3, 5], dtype=jnp.int32)
    synth_key = jax.random.PRNGKey(seed + 1)
    return w0, crop_pos, synth_key


# ----------------------------------------------------------------------------
# Policy-path benchmark fixture: the reference's throughput protocol times
# set_input -> forward -> get_output through the PUBLIC policy (inversion-zip
# lookups, host<->device transfers, prefetch loader), not just the jitted
# walk (backbone_latentaug.py:123-124, stats_time latent_aug.py:240-276).

def build_policy_workspace(root, res=256, batch_size=32, num_epochs=10,
                           opt_lr=0.01, crop_size=64, channel_base=32768,
                           channel_max=512, num_fp16_res=4, n_patients=4,
                           slices_per_patient=24, step=10, seed=0):
    """Create a synthetic on-disk workspace (image zip, inversion zip,
    native checkpoint) at the requested shapes and return the AugOptions
    argv that runs the full LatentAugment policy on it.

    Shapes/weights default to the bench.py operating point so the policy
    program hits the same persistent compilation cache as the walk bench.
    """
    import io
    import pickle
    import zipfile

    from .models.stylegan2 import convert

    modalities = ["MR_nonrigid_CT", "MR_MR_T2"]
    dataset = "PolicyBench"
    dataset_name = f"PolicyBench-images-{res}"
    w_name = f"PolicyBench-inv-{res}"
    interim = os.path.join(root, "interim")
    ddir = os.path.join(interim, dataset)
    os.makedirs(ddir, exist_ok=True)

    # Same config constructor as build_synthetic_setup: the policy
    # program must hit the same persistent compilation cache as the
    # walk-only bench.
    g_cfg, d_cfg = _make_gd_configs(res, len(modalities), channel_base,
                                    channel_max, num_fp16_res)
    kg, kd = jax.random.split(jax.random.PRNGKey(seed))
    ckpt = os.path.join(root, "policy_ckpt.pkl")
    convert.save_checkpoint(ckpt, networks.generator_init(kg, g_cfg), g_cfg,
                            networks.discriminator_init(kd, d_cfg), d_cfg)

    rng = np.random.RandomState(seed)
    img_zip = os.path.join(ddir, dataset_name + ".zip")
    fnames = []
    with zipfile.ZipFile(img_zip, "w") as zf:
        for p in range(n_patients):
            for s in range(slices_per_patient):
                slice_id = 10 + s * 5  # ids 00010.. (schedule-compatible)
                name = (f"train/patient{p:03d}/"
                        f"train_patient{p:03d}_{slice_id:05d}.pickle")
                img = {m: rng.rand(res, res).astype(np.float32) * 255.0
                       for m in modalities}
                buf = io.BytesIO()
                pickle.dump(img, buf)
                zf.writestr(name, buf.getvalue())
                fnames.append(name)

    w_zip = os.path.join(ddir, w_name + ".zip")
    with zipfile.ZipFile(w_zip, "w") as zf:
        for name in fnames:
            w = rng.randn(g_cfg.num_ws, g_cfg.w_dim).astype(np.float32) * 0.1
            buf = io.BytesIO()
            pickle.dump(w, buf)
            zf.writestr(name, buf.getvalue())

    argv = [
        "--dataroot", img_zip,
        "--checkpoints_dir", os.path.join(root, "checkpoints"),
        "--dataset_mode", "pelvis",
        "--load_size", str(res),
        "--batch_size", str(batch_size),
        "--aug", "latent",
        "--model_dir", ckpt,
        "--interim_dir", interim,
        "--dataset_aug", dataset,
        "--dataset_name_aug", dataset_name,
        "--dataset_w_name", w_name,
        "--img_resolution", str(res),
        "--crop_size_aug", str(crop_size),
        "--init_w", "inv",
        "--step_img", str(step),
        "--step_w", str(step),
        "--opt_num_epochs", str(num_epochs),
        "--opt_lr", str(opt_lr),
        # Tuned operating point (backbone_latentaug.py:46-54) + always-on
        # augmentation so every batch runs the walk.
        "--w_lpips", "10", "--w_pix", "0.1", "--w_latent", "0.001",
        "--w_disc", "0.01", "--p_thres", "0.0",
        "--num_fp16_res", str(num_fp16_res),
        "--name", "policy_bench",
    ]
    return argv


def run_policy_bench(argv, n_batches=4):
    """Run the public per-batch protocol; returns (per-batch times[1:],
    batch_size, per-phase times[1:] as [set_input, forward, get_output]
    seconds per batch). The first batch (compile + stat building already
    done at create_augment time; first forward still pays dispatch warmup)
    is discarded exactly as the reference's stats_time[1:] protocol."""
    import time

    from .augments import create_augment
    from .data import create_dataset
    from .options import AugOptions

    opt = AugOptions().parse(argv=argv, install_logger=False)
    dataset = create_dataset(opt)
    augment = create_augment(opt)

    times = []
    phases = []  # per-batch [set_input, forward, get_output] seconds
    it = iter(dataset)
    for i in range(n_batches):
        data = next(it)
        t0 = time.time()
        augment.set_input(data)
        t1 = time.time()
        augment.forward()
        t2 = time.time()
        out = augment.get_output()
        # get_output returns host numpy — forcing a sum guarantees the
        # bytes are real (relay fetch), not a lazy view.
        assert np.isfinite(out["A"].sum()) and np.isfinite(out["B"].sum())
        t3 = time.time()
        times.append(t3 - t0)
        # forward() materializes the augmented batch host-side before it
        # returns (latent_aug.forward's np.asarray), so the device walk
        # AND the result fetch land in the forward phase; set_input
        # isolates the host-side prep (zip lookups, batch concat,
        # w upload) and get_output is host-side slicing only.
        phases.append([t1 - t0, t2 - t1, t3 - t2])
    return times[1:], opt.batch_size, phases[1:]

"""Synthetic dataset + checkpoint builders for end-to-end tests.

Creates the same on-disk layouts the reference consumes: an image zip of
`<split>/<patient>/<slice>.pickle` modality dicts, an inversion zip of
matching w+ code pickles, and a tiny native StyleGAN2 checkpoint.
"""

import io
import os
import pickle
import zipfile

import numpy as np

import jax

from latentaugment_tpu.models.stylegan2 import convert, networks

MODALITIES = ["MR_nonrigid_CT", "MR_MR_T2"]
RES = 32


def make_image_zip(path, n_patients=3, slices_per_patient=4, split="train",
                   res=RES, seed=0):
    rng = np.random.RandomState(seed)
    fnames = []
    with zipfile.ZipFile(path, "w") as zf:
        for p in range(n_patients):
            for s in range(slices_per_patient):
                slice_id = 10 + s * 5  # ids 00010, 00015, ... (schedule-compatible)
                name = f"{split}/patient{p:03d}/{split}_patient{p:03d}_{slice_id:05d}.pickle"
                img = {m: rng.rand(res, res).astype(np.float32) * 255.0
                       for m in MODALITIES}
                buf = io.BytesIO()
                pickle.dump(img, buf)
                zf.writestr(name, buf.getvalue())
                fnames.append(name)
    return fnames


def make_latent_zip(path, fnames, num_ws, w_dim, seed=1):
    rng = np.random.RandomState(seed)
    with zipfile.ZipFile(path, "w") as zf:
        for name in fnames:
            w = rng.randn(num_ws, w_dim).astype(np.float32) * 0.1
            buf = io.BytesIO()
            pickle.dump(w, buf)
            zf.writestr(name, buf.getvalue())


def make_checkpoint(path, res=RES, img_channels=2, seed=0, c_dim=0,
                    arch="stylegan2"):
    if arch == "stylegan3":
        from latentaugment_tpu.models.stylegan3 import networks as networks3

        g_cfg = networks3.generator_config(z_dim=32, c_dim=c_dim, w_dim=32,
                                           img_resolution=res,
                                           img_channels=img_channels,
                                           channel_base=1024, channel_max=32,
                                           num_layers=4,
                                           num_mapping_layers=2)
        g_params = networks3.generator_init(jax.random.PRNGKey(seed), g_cfg)
    else:
        g_cfg = networks.generator_config(z_dim=32, c_dim=c_dim, w_dim=32,
                                          img_resolution=res,
                                          img_channels=img_channels,
                                          channel_base=512, channel_max=64,
                                          num_mapping_layers=2)
        g_params = networks.generator_init(jax.random.PRNGKey(seed), g_cfg)
    # The discriminator is always the SG2 one (the alias-free family
    # changes only the generator — models.networks_for).
    d_cfg = networks.discriminator_config(c_dim=c_dim, img_resolution=res,
                                          img_channels=img_channels,
                                          channel_base=512, channel_max=64,
                                          mbstd_group_size=2,
                                          num_mapping_layers=2)
    d_params = networks.discriminator_init(jax.random.PRNGKey(seed + 1), d_cfg)
    convert.save_checkpoint(path, g_params, g_cfg, d_params, d_cfg)
    return g_cfg, d_cfg


def build_workspace(root, split="train", c_dim=0, arch="stylegan2"):
    """Create the full directory layout an AugOptions run expects.

    Returns a dict of paths/args suitable for AugOptions().parse(argv=...).
    c_dim > 0 writes a conditional checkpoint (label-embed mapping +
    projection D) for the conditional-walk extension tests; arch
    selects the generator family inside the checkpoint (the policy path
    dispatches on the saved arch tag — models.networks_for).
    """
    root = str(root)
    dataset = "SynthSet"
    dataset_name = "SynthSet-images"
    w_name = "SynthSet-inv"
    interim = os.path.join(root, "interim")
    ddir = os.path.join(interim, dataset)
    os.makedirs(ddir, exist_ok=True)

    img_zip = os.path.join(ddir, dataset_name + ".zip")
    fnames = make_image_zip(img_zip, split=split)

    ckpt = os.path.join(root, "ckpt.pkl")
    g_cfg, d_cfg = make_checkpoint(ckpt, c_dim=c_dim, arch=arch)

    w_zip = os.path.join(ddir, w_name + ".zip")
    make_latent_zip(w_zip, fnames, num_ws=g_cfg.num_ws, w_dim=g_cfg.w_dim)

    ckpt_dir = os.path.join(root, "checkpoints")
    argv = [
        "--dataroot", img_zip,
        "--checkpoints_dir", ckpt_dir,
        "--dataset_mode", "pelvis",
        "--load_size", str(RES),
        "--batch_size", "2",
        "--aug", "latent",
        "--model_dir", ckpt,
        "--interim_dir", interim,
        "--dataset_aug", dataset,
        "--dataset_name_aug", dataset_name,
        "--dataset_w_name", w_name,
        "--img_resolution", str(RES),
        "--crop_size_aug", "16",
        "--step_img", "1",
        "--step_w", "1",
        "--opt_num_epochs", "3",
        "--name", "synth_exp",
    ]
    return {
        "argv": argv, "img_zip": img_zip, "w_zip": w_zip, "ckpt": ckpt,
        "interim": interim, "dataset": dataset, "dataset_name": dataset_name,
        "w_name": w_name, "fnames": fnames, "g_cfg": g_cfg,
        "checkpoints_dir": ckpt_dir,
    }

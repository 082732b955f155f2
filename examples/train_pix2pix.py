"""Worked end-to-end example: train a pix2pix consumer ON LatentAugment
batches — the downstream loop the reference sketches but never finishes
(reference backbone.py:28-31 calls `model.optimize_parameters()` on an
undefined `model`; README.md:66-86 frames augmentation as input to a
pix2pix-style translator).

Per batch: the augment policy runs the K-step latent walk on TPU, and
the augmented (A, B) pair feeds one jitted pix2pix train step. With
--n_mesh_devices N both programs shard the batch over the same mesh.

Run on synthetic data (no downloads, CPU ok):

    python examples/train_pix2pix.py --synthetic --pix2pix_steps 20

or point the usual AugOptions flags at a real workspace, e.g.:

    python examples/train_pix2pix.py --dataroot ... --model_dir ... \
        --dataset_mode pelvis --aug latent --init_w inv --batch_size 8
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_argv_synthetic(root):
    """Create a synthetic workspace (same builders the tests use)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from synthetic import build_workspace

    ws = build_workspace(root)
    return ws["argv"] + ["--init_w", "inv", "--p_thres", "0.0",
                         "--w_pix", "0.1", "--w_lpips", "1.0",
                         "--w_latent", "0.001", "--w_disc", "0.01",
                         "--opt_num_epochs", "2", "--name", "pix2pix_demo"]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    # Example-local flags (everything else is the standard AugOptions
    # surface, see MIGRATION.md §1).
    def pop_flag(name, default=None, is_bool=False):
        if name in argv:
            i = argv.index(name)
            argv.pop(i)
            return True if is_bool else argv.pop(i)
        return default

    synthetic = pop_flag("--synthetic", False, is_bool=True)
    steps = int(pop_flag("--pix2pix_steps", "50"))
    lambda_l1 = float(pop_flag("--lambda_l1", "100.0"))
    lr = float(pop_flag("--pix2pix_lr", "2e-4"))

    if synthetic:
        import tempfile

        root = tempfile.mkdtemp(prefix="pix2pix_demo_")
        argv = build_argv_synthetic(root) + argv

    import jax

    from latentaugment_tpu.augments import create_augment
    from latentaugment_tpu.data import create_dataset
    from latentaugment_tpu.models import pix2pix
    from latentaugment_tpu.options import AugOptions

    opt = AugOptions().parse(argv=argv, install_logger=False)
    dataset = create_dataset(opt)
    augment = create_augment(opt)

    cfg = pix2pix.pix2pix_config(lambda_l1=lambda_l1, lr=lr)
    params = pix2pix.init_all(jax.random.PRNGKey(getattr(opt, "seed", 0)), cfg)
    opt_state = pix2pix.opt_init(params)
    train_step = pix2pix.make_train_step(cfg)
    print(f"pix2pix G+D params: {pix2pix.count_params(params):,}")

    mesh = getattr(getattr(augment, "latent_aug", None), "mesh", None)
    if mesh is not None:
        from latentaugment_tpu.parallel import mesh as pmesh

        params = jax.device_put(params, pmesh.replicated(mesh))
        opt_state = jax.device_put(opt_state, pmesh.replicated(mesh))

    step = 0
    t0 = time.time()
    while step < steps:
        for data in dataset:
            if step >= steps:
                break
            augment.set_input(data)
            augment.forward()
            out = augment.get_output()  # {'A','B','A_paths','B_paths'}
            a = np.asarray(out["A"], np.float32)
            b = np.asarray(out["B"], np.float32)
            if mesh is not None:
                from latentaugment_tpu.parallel import mesh as pmesh

                sh = pmesh.batch_sharding(mesh)
                a, b = jax.device_put(a, sh), jax.device_put(b, sh)
            params, opt_state, metrics = train_step(params, opt_state, a, b)
            step += 1
            if step % 10 == 0 or step == steps:
                m = {k: float(v) for k, v in metrics.items()}
                print(f"step {step:4d}  G {m['loss_G']:.3f}  "
                      f"D {m['loss_D']:.3f}  L1 {m['loss_L1']:.4f}  "
                      f"({(time.time() - t0) / step:.2f} s/step)")
    return params


if __name__ == "__main__":
    main()

"""Multi-HOST data parallelism over a real 2-process jax.distributed
cluster (Gloo CPU collectives).

Closes the one untested §2.6 surface: `parallel.mesh.init_distributed`
was previously a helper only exercised single-process. Here two OS
processes with 2 virtual CPU devices each form a 4-device global mesh;
the batch-sharded walk runs with cross-process collectives and must
reproduce the single-process result row-for-row.

Reference counterpart: the torch DataParallel/torch.distributed
machinery this framework replaces (SURVEY.md §2.6;
/root/reference/augments/utils/util_latent_aug.py:20-33).
"""

import os
import socket
import subprocess
import sys

import numpy as np

import jax
import pytest

from latentaugment_tpu import benchmark

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_walk_matches_single(tmp_path):
    # Single-process reference on the identical deterministic setup.
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2,
        crop_size=16, manifold_items=8, w_lpips=0.0)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg,
                                                          batch_size=4)
    img_ref, ws_ref, _ = jax.jit(fns.walk)(bundle, w0, crop_pos, synth_key)
    img_ref, ws_ref = np.asarray(img_ref), np.asarray(ws_ref)

    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")

    outs = [str(tmp_path / f"worker{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), outs[i],
             str(tmp_path)],
            env=env, cwd=REPO_ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    logs = []
    for i, p in enumerate(procs):
        try:
            # 40 min: two workers share ONE core on this host and the
            # TP leg adds a third walk compile per worker; under
            # machine-level contention 25 min was measured insufficient.
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{out}")

    # Reassemble the global batch from each process's local rows.
    img = np.empty_like(img_ref)
    ws = np.empty_like(ws_ref)
    covered = np.zeros(img_ref.shape[0], bool)
    for path in outs:
        z = np.load(path)
        off = int(z["offset"])
        n = z["img"].shape[0]
        img[off:off + n] = z["img"]
        ws[off:off + n] = z["ws"]
        covered[off:off + n] = True
    assert covered.all(), f"batch rows not fully covered\n{logs}"

    # Same tolerance as the single-host sharded==single test: GSPMD may
    # re-associate the batch-mean reductions across shards.
    np.testing.assert_allclose(img_ref, img, rtol=1e-2, atol=2e-3)
    np.testing.assert_allclose(ws_ref, ws, rtol=1e-2, atol=2e-3)

    # ---- trainer leg: Gmain loss + gradient from the 2-process cluster
    # must match a single-process evaluation of the identical setup
    # (deterministic init keys/batch; the worker mirrors this code).
    from latentaugment_tpu.models.stylegan2 import networks
    from latentaugment_tpu.models.stylegan2 import train as sg2_train

    g_cfg2 = networks.generator_config(
        z_dim=32, w_dim=32, img_resolution=32, img_channels=2,
        channel_base=1024, channel_max=32, num_fp16_res=0)
    d_cfg2 = networks.discriminator_config(
        img_resolution=32, img_channels=2, channel_base=1024,
        channel_max=32, num_fp16_res=0)
    tcfg = sg2_train.train_config(batch_size=4, aug="noaug",
                                  style_mixing_prob=0.9)
    tfns = sg2_train.make_train_fns(g_cfg2, d_cfg2, tcfg)
    kinit = jax.random.PRNGKey(13)
    gp = networks.generator_init(jax.random.fold_in(kinit, 0), g_cfg2)
    dp = networks.discriminator_init(jax.random.fold_in(kinit, 1), d_cfg2)
    rng = np.random.RandomState(21)
    z = np.asarray(rng.randn(4, g_cfg2.z_dim), np.float32)
    z2 = np.asarray(rng.randn(4, g_cfg2.z_dim), np.float32)
    k = jax.random.PRNGKey(5)
    import jax.numpy as jnp
    (loss_ref, _), grads_ref = jax.jit(jax.value_and_grad(
        tfns.loss_g_main, has_aux=True))(
            gp, dp, z, z2, None, k, k, k, jnp.float32(0.0))
    grad_vec_ref = np.concatenate([
        np.asarray(leaf).ravel()
        for leaf in jax.tree_util.tree_leaves(grads_ref)])

    for path in outs:
        z_npz = np.load(path)
        np.testing.assert_allclose(float(z_npz["g_loss"]), float(loss_ref),
                                   rtol=1e-5)
        np.testing.assert_allclose(z_npz["g_grad_vec"], grad_vec_ref,
                                   rtol=2e-3, atol=1e-5)
        # The in-worker train_loop interrupt/resume leg asserted bitwise
        # equality itself, and the DP×TP walk leg asserted TP==DP local
        # rows; these keys prove both legs ran to completion.
        assert int(z_npz["resume_ok"]) == 1
        assert int(z_npz["tp_ok"]) == 1


@pytest.mark.slow
def test_init_distributed_two_process_psum(tmp_path):
    """Smoke: init_distributed forms the cluster and a cross-process
    reduction returns the global (not process-local) answer."""
    script = tmp_path / "psum_worker.py"
    script.write_text(
        "import os, sys\n"
        "pid = int(sys.argv[1]); port = sys.argv[2]\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=2'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from latentaugment_tpu.parallel import mesh as pmesh\n"
        "rank, nproc = pmesh.init_distributed(f'localhost:{port}', 2, pid)\n"
        "assert (rank, nproc) == (pid, 2)\n"
        "mesh = pmesh.get_mesh(); sh = pmesh.batch_sharding(mesh)\n"
        "local = np.arange(8, dtype=np.float32)"
        ".reshape(8, 1)[pid*4:(pid+1)*4]\n"
        "g = jax.make_array_from_process_local_data(sh, local,\n"
        "                                           global_shape=(8, 1))\n"
        "out = jax.jit(lambda x: jnp.mean(x) * jnp.ones_like(x),\n"
        "              in_shardings=sh, out_shardings=sh)(g)\n"
        "got = float(np.asarray(out.addressable_shards[0].data)[0, 0])\n"
        "assert abs(got - 3.5) < 1e-6, got\n"
        "print('psum ok', flush=True)\n")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO_ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), str(port)],
                              env=env, cwd=REPO_ROOT, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "psum ok" in out

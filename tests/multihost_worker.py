"""Worker process for tests/test_multihost.py — NOT a test module.

Each of the two worker processes owns 2 virtual CPU devices, joins a
jax.distributed cluster via `parallel.mesh.init_distributed`, and runs
the batch-sharded latent walk over the resulting 4-device global mesh
(Gloo carries the cross-process collectives). It writes its local
output shards to an .npz for the parent test to reassemble and compare
against a single-process walk.

Reference counterpart: the reference scales past one host with
torch.distributed process groups (SURVEY.md §2.6); here the SAME
NamedShardings used single-host simply span the global mesh.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    # 2 virtual CPU devices per process; must be set before jax import.
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    # The axon sitecustomize pins a remote TPU platform; only the config
    # update (not the env var) can force CPU (see tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from latentaugment_tpu import benchmark
    from latentaugment_tpu.parallel import mesh as pmesh

    rank, nproc = pmesh.init_distributed(f"localhost:{port}",
                                         num_processes=2, process_id=pid)
    assert (rank, nproc) == (pid, 2), (rank, nproc)
    assert jax.local_device_count() == 2
    assert jax.device_count() == 4

    # Identical deterministic setup in both processes (replicated state
    # must agree across hosts — check_replica_consistency's invariant).
    fns, bundle, g_cfg = benchmark.build_synthetic_setup(
        res=32, channel_base=1024, channel_max=64, num_epochs=2,
        crop_size=16, manifold_items=8, w_lpips=0.0)
    w0, crop_pos, synth_key = benchmark.example_walk_args(g_cfg,
                                                          batch_size=4)

    mesh = pmesh.get_mesh()  # spans both processes' devices
    batch = pmesh.batch_sharding(mesh)
    repl = pmesh.replicated(mesh)

    def to_global(tree, sharding):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)

    gbundle = to_global(bundle, repl)
    gcrop = to_global(crop_pos, repl)
    gkey = to_global(synth_key, repl)
    # Each process contributes only ITS batch rows (2 of 4).
    w_local = np.asarray(w0)[pid * 2:(pid + 1) * 2]
    gw0 = jax.make_array_from_process_local_data(
        batch, w_local, global_shape=tuple(w0.shape))

    walk = jax.jit(fns.walk, in_shardings=(repl, batch, repl, repl),
                   out_shardings=(batch, batch, repl))
    img, ws, _ = walk(gbundle, gw0, gcrop, gkey)
    jax.block_until_ready((img, ws))

    def local_rows(garr):
        shards = sorted(garr.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        off = shards[0].index[0].start or 0
        return off, np.concatenate([np.asarray(s.data) for s in shards],
                                   axis=0)

    img_off, img_local = local_rows(img)
    ws_off, ws_local = local_rows(ws)
    assert img_off == ws_off == pid * 2, (img_off, ws_off, pid)

    # ---- DP×TP leg: the same walk on a ('data','model') mesh spanning
    # both processes (conv out-channels sharded over 'model') — the one
    # TP combination the single-process tests cannot exercise. The model
    # axis is innermost, so each process's 2 devices form one data row
    # and row ownership matches the DP leg; local rows must agree with
    # the DP leg's up to GSPMD reduction order.
    from jax.sharding import PartitionSpec as P

    mesh_tp = pmesh.get_mesh(n_model=2)
    batch_tp = pmesh.batch_sharding(mesh_tp)
    repl_tp = pmesh.replicated(mesh_tp)
    bundle_tp_sh = pmesh.tp_tree_shardings(bundle, mesh_tp)
    n_tp = sum(1 for s in jax.tree_util.tree_leaves(bundle_tp_sh)
               if s.spec != P())
    assert n_tp >= 3, f"TP placed only {n_tp} leaves"
    gbundle_tp = jax.tree.map(
        lambda x, sh: jax.make_array_from_process_local_data(
            sh, np.asarray(x)), bundle, bundle_tp_sh)
    gw0_tp = jax.make_array_from_process_local_data(
        batch_tp, w_local, global_shape=tuple(w0.shape))
    walk_tp = jax.jit(
        fns.walk, in_shardings=(bundle_tp_sh, batch_tp, repl_tp, repl_tp),
        out_shardings=(batch_tp, batch_tp, repl_tp))
    img_tp, ws_tp, _ = walk_tp(gbundle_tp, gw0_tp,
                               to_global(crop_pos, repl_tp),
                               to_global(synth_key, repl_tp))
    jax.block_until_ready((img_tp, ws_tp))
    # Under TP the batch rows are replicated over the model axis: both
    # local devices hold the same rows — dedupe shards by row index.
    shards = {s.index[0].start or 0: np.asarray(s.data)
              for s in img_tp.addressable_shards}
    tp_off = min(shards)
    img_tp_local = np.concatenate(
        [shards[o] for o in sorted(shards)], axis=0)
    assert tp_off == pid * 2, (tp_off, pid)
    # atol 1e-2: TP re-associates the channel contractions; K walk steps
    # amplify the drift (same bound as dryrun_multichip's TP leg — a
    # wrong sharding produces O(1) garbage, still caught).
    np.testing.assert_allclose(img_tp_local, img_local, rtol=1e-2,
                               atol=1e-2)

    # ---- trainer step over the same 2-process cluster: loss + G-gradient
    # of the Gmain phase on the global batch must equal the single-process
    # values (the parent computes the reference). Params replicate across
    # hosts; each process contributes its 2 batch rows; the gradient's
    # batch-mean becomes a cross-process all-reduce under GSPMD.
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
    tfns = sg2_train.make_train_fns(g_cfg2, d_cfg2, tcfg, mesh=mesh)
    kinit = jax.random.PRNGKey(13)
    gp = networks.generator_init(jax.random.fold_in(kinit, 0), g_cfg2)
    dp = networks.discriminator_init(jax.random.fold_in(kinit, 1), d_cfg2)
    gp, dp = to_global(gp, repl), to_global(dp, repl)

    rng = np.random.RandomState(21)
    z_all = rng.randn(4, g_cfg2.z_dim).astype(np.float32)
    z2_all = rng.randn(4, g_cfg2.z_dim).astype(np.float32)
    gz = jax.make_array_from_process_local_data(
        batch, z_all[pid * 2:(pid + 1) * 2], global_shape=(4, g_cfg2.z_dim))
    gz2 = jax.make_array_from_process_local_data(
        batch, z2_all[pid * 2:(pid + 1) * 2], global_shape=(4, g_cfg2.z_dim))
    k = jax.random.PRNGKey(5)
    (g_loss, _), g_grads = jax.jit(jax.value_and_grad(
        tfns.loss_g_main, has_aux=True))(
            gp, dp, gz, gz2, None, k, k, k, jax.numpy.float32(0.0))
    jax.block_until_ready(g_grads)
    grad_vec = np.concatenate([
        np.asarray(leaf).ravel()
        for leaf in jax.tree_util.tree_leaves(g_grads)])

    # ---- train_loop interrupt/resume leg: the full training loop runs
    # across the cluster (rank-0 snapshot writes, post-snapshot barrier,
    # replicated-state training-state pickle), and interrupted+resumed
    # device state must equal an uninterrupted run bit for bit. Both
    # processes feed the identical global batch stream (device_put's
    # cross-process global semantics), so state stays replicated.
    # Both processes must share this root (rank 0 writes the states,
    # rank 1 globs them), and it must be unique per invocation — a fixed
    # fallback dir could resurrect a stale training-state-*.pkl from an
    # earlier run and compare mismatched runs. The parent test provides
    # a fresh tmp dir; manual invocations must too.
    if len(sys.argv) < 5:
        raise SystemExit(
            f"usage: {sys.argv[0]} <coordinator> <num_processes> "
            "<process_id> <run_root>\n  run_root: a SHARED, "
            "per-invocation-unique directory (rank 0 writes snapshots/"
            "training states there, other ranks glob them)")
    run_root = sys.argv[4]
    g_cfg3 = networks.generator_config(
        z_dim=16, w_dim=16, img_resolution=16, img_channels=2,
        channel_base=256, channel_max=16, num_mapping_layers=2,
        num_fp16_res=0)
    d_cfg3 = networks.discriminator_config(
        img_resolution=16, img_channels=2, channel_base=256,
        channel_max=16, num_fp16_res=0)
    cfg3 = sg2_train.train_config(batch_size=4, aug="ada", aug_pipe="bgc",
                                  ada_interval=3, ada_kimg=0.01,
                                  noise_mode="random")

    def data_iter(start_batch=0):
        i = start_batch
        while True:
            r = np.random.RandomState(2000 + i)
            yield r.rand(4, 2, 16, 16).astype(np.float32) * 2 - 1, None
            i += 1

    ref_state = sg2_train.train_loop(
        g_cfg3, d_cfg3, data_iter(), cfg3, total_kimg=0.016,
        run_dir=os.path.join(run_root, "mh_a"), snapshot_kimg=0,
        log_every=100, seed=11, mesh=mesh)
    run_b = os.path.join(run_root, "mh_b")
    sg2_train.train_loop(
        g_cfg3, d_cfg3, data_iter(), cfg3, total_kimg=0.008,
        run_dir=run_b, snapshot_kimg=0.008, log_every=100, seed=11,
        mesh=mesh)
    import glob as _glob
    states = sorted(_glob.glob(os.path.join(run_b,
                                            "training-state-*.pkl")))
    assert states, f"[worker {pid}] no training state written"
    out_state = sg2_train.train_loop(
        g_cfg3, d_cfg3, data_iter(start_batch=2), cfg3,
        total_kimg=0.016, run_dir=run_b, snapshot_kimg=0,
        log_every=100, seed=999, mesh=mesh, resume_state=states[-1])
    for a, b in zip(jax.tree_util.tree_leaves(ref_state),
                    jax.tree_util.tree_leaves(out_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    np.savez(out_path, offset=img_off, img=img_local, ws=ws_local,
             g_loss=float(g_loss), g_grad_vec=grad_vec, resume_ok=1,
             tp_ok=1)
    print(f"[worker {pid}] OK rows [{img_off}:{img_off + img_local.shape[0]}]"
          f" g_loss={float(g_loss):.6f} resume_ok tp_ok", flush=True)


if __name__ == "__main__":
    main()

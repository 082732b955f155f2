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
    np.savez(out_path, offset=img_off, img=img_local, ws=ws_local)
    print(f"[worker {pid}] OK rows [{img_off}:{img_off + img_local.shape[0]}]",
          flush=True)


if __name__ == "__main__":
    main()

"""Device mesh + sharding helpers.

Replaces the reference's parallel machinery (SURVEY.md §2.6): the
single-process torch DataParallel scatter/gather and the
torch.distributed collectives become a `jax.sharding.Mesh` with a
'data' axis; batch tensors get a NamedSharding over it and GSPMD
inserts the ICI collectives (psum for batch-mean losses, all_gather for
outputs) automatically inside jit.

One axis suffices because LatentAugment is a conv GAN with per-sample
independent optimization — the only scaling dimension is the batch
(reference has no tensor/pipeline/sequence parallelism either; SURVEY.md
§2.6/§5). Multi-host: the same mesh spans hosts; DCN handles the
cross-slice edges.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices=None, devices=None):
    """1-D 'data' mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(x, mesh):
    """Place a host array with its batch axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh))


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize multi-host JAX (multi-slice DP over DCN).

    Thin wrapper over jax.distributed.initialize; after it, get_mesh()
    spans all processes' devices and the same NamedShardings scale out —
    no further code changes (GSPMD handles the DCN edges).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def pad_to_multiple(x, multiple, axis=0):
    """Pad the batch so it divides the mesh size; returns (padded, orig_len)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(np.asarray(x), pad, mode="edge"), n

"""Device mesh + sharding helpers.

Replaces the reference's parallel machinery (SURVEY.md §2.6): the
single-process torch DataParallel scatter/gather and the
torch.distributed collectives become a `jax.sharding.Mesh` with a
'data' axis; batch tensors get a NamedSharding over it and GSPMD
inserts the ICI collectives (psum for batch-mean losses, all_gather for
outputs) automatically inside jit.

One axis suffices for throughput because LatentAugment is a conv GAN
with per-sample independent optimization — the only scaling dimension is
the batch (reference has no tensor/pipeline/sequence parallelism either;
SURVEY.md §2.6/§5). Multi-host: the same mesh spans hosts; DCN handles
the cross-slice edges.

Beyond the reference, an optional 'model' axis adds tensor parallelism
(conv output channels sharded, GSPMD inserting the channel-contraction
collectives) for the latency-bound regime the 1-D mesh cannot serve: a
batch too small to split across all chips still spreads its FLOPs over
the 'model' group. `get_mesh(n, n_model=m)` builds the ('data','model')
mesh; `tp_tree_shardings` produces the per-leaf param shardings.

Pipeline/sequence/expert parallelism are deliberately absent: the walk
is a K-step sequential optimization of one small latent (no microbatch
stream to pipeline), images are not sequences, and the networks have no
experts — DP×TP covers every scaling regime this workload has.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices=None, devices=None, n_model=1):
    """'data' mesh over the first n devices (default: all).

    With n_model > 1, a 2-D ('data', 'model') mesh for DP×TP: the model
    axis is innermost (adjacent device ids) so TP's channel-contraction
    collectives ride the fastest ICI links."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if n_model and n_model > 1:
        n = len(devices)
        if n % n_model:
            raise ValueError(
                f"n_model={n_model} must divide the device count {n}")
        return Mesh(np.array(devices).reshape(n // n_model, n_model),
                    ("data", "model"))
    return Mesh(np.array(devices), ("data",))


def get_hybrid_mesh(n_slices, per_slice=None, devices=None):
    """('dcn', 'data') mesh for multi-slice pods (SURVEY §2.6: the DCN
    axis is only ever multi-slice DP).

    The OUTER axis maps across slices — in a real pod those edges are
    data-center network, orders of magnitude slower than ICI — and the
    inner axis stays within a slice. Multi-slice data parallelism
    shards the batch over BOTH axes (batch_sharding below emits
    P(('dcn','data')) on this mesh), so per-step communication over DCN
    is only the small loss/grad all-reduces; all activation-sized
    traffic stays on the ICI axis. Device order: jax.devices()
    enumerates slice-by-slice, so reshape(n_slices, per_slice) puts
    same-slice devices on the inner axis."""
    if devices is None:
        devices = jax.devices()
    if per_slice is None:
        if len(devices) % n_slices:
            raise ValueError(
                f"n_slices={n_slices} must divide {len(devices)} devices")
        per_slice = len(devices) // n_slices
    if len(devices) < n_slices * per_slice:
        raise ValueError(
            f"{n_slices}x{per_slice} mesh needs {n_slices * per_slice} "
            f"devices, only {len(devices)} available")
    devices = devices[:n_slices * per_slice]
    return Mesh(np.array(devices).reshape(n_slices, per_slice),
                ("dcn", "data"))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over every data-parallel axis
    present ('dcn' and/or 'data'); replicate the rest."""
    dp_axes = tuple(a for a in ("dcn", "data") if a in mesh.axis_names)
    return NamedSharding(mesh, P(dp_axes))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(x, mesh):
    """Place a host array with its batch axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh))


def model_axis_size(mesh):
    return dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)


def tp_tree_shardings(tree, mesh):
    """Per-leaf NamedSharding pytree: tensor-parallel param placement.

    Conv weights [out_c, in_c, kh, kw] get out_c sharded over 'model'
    (each TP shard owns a slice of every layer's output channels; GSPMD
    derives the activation shardings and inserts the channel-contraction
    collectives). Everything else — biases, FIR taps, style affines,
    manifold summaries — is replicated: they are O(C) or stat tensors,
    so replication costs nothing. Shape is the only signal available in
    a bundle pytree, so the rule is "any 4-D leaf with a divisible dim0"
    — conv weights are the only 4-D leaves in our bundles today; a
    future 4-D non-weight bundle entry (e.g. an image stack) would be
    sharded on dim0 too and should be added as an explicit exception
    here. Leaves whose out_c does not divide the model axis stay
    replicated (e.g. 2-channel toRGB heads). On a 1-D mesh this returns
    all-replicated, i.e. exactly the DP layout."""
    n_model = model_axis_size(mesh)
    repl = NamedSharding(mesh, P())
    if n_model <= 1:
        return jax.tree_util.tree_map(lambda _: repl, tree)
    tp = NamedSharding(mesh, P("model"))

    def rule(x):
        shape = getattr(x, "shape", ())
        if (len(shape) == 4 and shape[0] % n_model == 0
                and shape[0] >= 2 * n_model):
            return tp
        return repl

    return jax.tree_util.tree_map(rule, tree)


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

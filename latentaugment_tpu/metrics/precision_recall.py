"""kNN-manifold Precision/Recall (Kynkaanniemi et al.).

Parity: reference metrics/precision_recall.py:19-85. The per-rank
round-robin + torch.distributed.broadcast of distance tiles becomes a
jitted pairwise-distance tile computed on device; XLA shards the tile
matmuls when the arrays are mesh-sharded. Math: pairwise Euclidean
distances, k-th neighbor threshold per manifold row, probe accepted if
within any manifold row's threshold.
"""

import numpy as np

import jax
import jax.numpy as jnp

from . import metric_utils

DETECTOR_URL = ('https://api.ngc.nvidia.com/v2/models/nvidia/research/'
                'stylegan3/versions/1/files/metrics/vgg16.pkl')


@jax.jit
def _dist_tile(rows, cols):
    """Euclidean distances [r, c] via the (r^2 + c^2 - 2rc) decomposition."""
    rr = jnp.sum(jnp.square(rows), axis=1, keepdims=True)
    cc = jnp.sum(jnp.square(cols), axis=1)
    d2 = rr + cc[None, :] - 2.0 * rows @ cols.T
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def compute_distances(row_features, col_features, col_batch_size=10000,
                      num_gpus=1, rank=0, mesh=None):
    """Chunked distance matrix [rows, cols] (device tiles, host assembly).

    With a mesh, each tile's ROWS are sharded over the 'data' axis and the
    cols replicated — the direct analogue of the reference's per-rank
    round-robin + broadcast (precision_recall.py:25-31), with GSPMD
    placing the gather.
    """
    rows = np.asarray(row_features, np.float32)
    n_rows = rows.shape[0]
    if mesh is not None:
        from ..parallel import mesh as pmesh

        rows, _ = pmesh.pad_to_multiple(rows, mesh.devices.size)
        rows = jax.device_put(jnp.asarray(rows), pmesh.batch_sharding(mesh))
        put_cols = lambda c: jax.device_put(jnp.asarray(c, jnp.float32),
                                            pmesh.replicated(mesh))
    else:
        rows = jnp.asarray(rows)
        put_cols = lambda c: jnp.asarray(c, jnp.float32)
    out = []
    n = col_features.shape[0]
    for lo in range(0, n, col_batch_size):
        cols = put_cols(col_features[lo:lo + col_batch_size])
        out.append(np.asarray(_dist_tile(rows, cols))[:n_rows])
    return np.concatenate(out, axis=1)


def knn_precision_recall(real_features, gen_features, nhood_size=3,
                         row_batch_size=10000, col_batch_size=10000,
                         mesh=None):
    """Core PR computation on feature arrays."""
    results = {}
    max_nhood = min(real_features.shape[0], gen_features.shape[0]) - 1
    if max_nhood < 1:
        # A 1-item (or empty) feature set has no neighbor besides self;
        # the kNN radius is undefined. Report 0/0 instead of crashing in
        # np.partition (real runs use 10-50k items and never hit this).
        print("[metrics] WARNING: fewer than 2 items in a feature set; "
              "precision/recall are undefined — reporting 0.0/0.0")
        return 0.0, 0.0
    if nhood_size > max_nhood:
        # Degenerate demo-size sets: the kNN radius needs nhood_size
        # neighbors besides self. Clamp + warn rather than crash.
        print(f"[metrics] WARNING: nhood_size {nhood_size} > n-1 "
              f"({max_nhood}); clamping — PR values are degenerate at "
              "this sample count")
        nhood_size = max_nhood
    for name, manifold, probes in [("precision", real_features, gen_features),
                                   ("recall", gen_features, real_features)]:
        kth = []
        for lo in range(0, manifold.shape[0], row_batch_size):
            dist = compute_distances(manifold[lo:lo + row_batch_size], manifold,
                                     col_batch_size, mesh=mesh)
            # k-th smallest excluding self -> index nhood_size (0-based) after
            # sorting, matching torch kthvalue(nhood_size + 1).
            kth.append(np.partition(dist, nhood_size, axis=1)[:, nhood_size])
        kth = np.concatenate(kth)
        pred = []
        for lo in range(0, probes.shape[0], row_batch_size):
            dist = compute_distances(probes[lo:lo + row_batch_size], manifold,
                                     col_batch_size, mesh=mesh)
            pred.append((dist <= kth[None, :]).any(axis=1))
        results[name] = float(np.concatenate(pred).astype(np.float64).mean())
    return results["precision"], results["recall"]


def compute_pr(opts, max_real, num_gen, nhood_size, row_batch_size,
               col_batch_size):
    detector_kwargs = dict(return_features=True)
    real_features = metric_utils.compute_feature_stats_for_dataset(
        opts=opts, detector_url=DETECTOR_URL, detector_kwargs=detector_kwargs,
        mode_dict=opts.mode_dict, rel_lo=0, rel_hi=0, capture_all=True,
        max_items=max_real).get_all()

    if opts.dataset_kwargs_gen:
        gen_features = metric_utils.compute_feature_stats_for_aug_dataset(
            opts=opts, detector_url=DETECTOR_URL, detector_kwargs=detector_kwargs,
            mode_dict=opts.mode_dict, rel_lo=0, rel_hi=1, capture_all=True,
            max_items=num_gen).get_all()
    else:
        gen_features = metric_utils.compute_feature_stats_for_generator(
            opts=opts, detector_url=DETECTOR_URL, detector_kwargs=detector_kwargs,
            mode_dict=opts.mode_dict, rel_lo=0, rel_hi=1, capture_all=True,
            max_items=num_gen).get_all()

    return knn_precision_recall(real_features, gen_features, nhood_size,
                                row_batch_size, col_batch_size,
                                mesh=opts.mesh)

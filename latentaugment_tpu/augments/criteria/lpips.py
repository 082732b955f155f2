"""LPIPS perceptual criterion (local variant).

Parity: reference augments/criteria/lpips/ — VGG16 feature extractor
with unit-normalized activations, frozen 1x1 'LinLayers' weighting a
layer subset, and `forward` (x vs y) / `forward_tr` (x vs precomputed
target feature lists) distances. The reference's torchvision backbone +
downloaded richzhang lin weights become our functional VGG16
(models/vgg.py) with lin weights loaded from a converted checkpoint or
seeded-ones fallback.

The reference restricts VGG16 to target layers [16, 23, 30]
(criteria/lpips/networks.py:94-95) = relu3_3, relu4_3, relu5_3; we use
the same subset by default.
"""

import jax
import jax.numpy as jnp

from ...models import vgg

# torchvision layer indices [16, 23, 30] -> our tap names.
DEFAULT_TARGET_LAYERS = ["conv3_3", "conv4_3", "conv5_3"]


def _normalize_act(a, eps=1e-10):
    return a * jax.lax.rsqrt(jnp.sum(jnp.square(a), axis=1, keepdims=True) + eps)


def embedding_from_params(vgg_params, lin, x, target_layers=None):
    """Pure-function form of LPIPS.embedding (jit/walk-friendly).

    x in [-1, 1], [N, 3, H, W]; lin: {tap: [C]} weights pytree.
    """
    target_layers = list(target_layers or DEFAULT_TARGET_LAYERS)
    xs = (x + 1.0) * 127.5
    acts = vgg.vgg_features(vgg_params, xs, taps=target_layers)
    outs = []
    n = x.shape[0]
    for tap in target_layers:
        fx = _normalize_act(acts[tap].astype(jnp.float32))
        w = jnp.maximum(lin[tap], 0.0)[None, :, None, None]
        hw = fx.shape[2] * fx.shape[3]
        a = fx * jnp.sqrt(w) / jnp.sqrt(float(hw))
        outs.append(a.reshape(n, -1))
    return jnp.concatenate(outs, axis=1)


class LPIPS:
    """Learned perceptual distance over a VGG16 layer subset.

    Works on images in [-1, 1] (like the reference criterion).
    """

    def __init__(self, net_type="vgg", params=None, lin=None,
                 target_layers=None, report_dir=None):
        if net_type != "vgg":
            raise NotImplementedError(
                f"net_type={net_type!r}: only the VGG16 backbone is "
                "implemented (the reference's alex/squeeze variants are "
                "unused by the LatentAugment path)")
        self.target_layers = list(target_layers or DEFAULT_TARGET_LAYERS)
        self.params = params if params is not None else vgg.get_vgg16()
        if lin is not None:
            self.lin = lin
        else:
            self.lin = {t: self.params.get("lin", {}).get(
                t, jnp.ones((vgg.LPIPS_CHANNELS[t],))) for t in self.target_layers}
        self._extract = jax.jit(self._extract_impl)

    def _extract_impl(self, x):
        # [-1,1] -> [0,255] for the shared backbone input convention.
        x = (x + 1.0) * 127.5
        acts = vgg.vgg_features(self.params, x, taps=self.target_layers)
        return [_normalize_act(acts[t].astype(jnp.float32))
                for t in self.target_layers]

    def extract_features(self, x):
        """[N,3,H,W] in [-1,1] -> list of unit-normalized activations."""
        return self._extract(jnp.asarray(x))

    def _layer_dist(self, fx, fy, tap):
        w = jnp.maximum(self.lin[tap], 0.0)[None, :, None, None]
        return jnp.mean(jnp.sum(w * jnp.square(fx - fy), axis=1), axis=(1, 2))

    def forward(self, x, y):
        """Per-pair LPIPS distance [N] between same-shape batches."""
        fxs = self.extract_features(x)
        fys = self.extract_features(y)
        total = 0.0
        for tap, fx, fy in zip(self.target_layers, fxs, fys):
            total = total + self._layer_dist(fx, fy, tap)
        return total

    __call__ = forward

    def embedding(self, x):
        """Per-image embedding whose squared-L2 equals the LPIPS distance
        over this criterion's layer subset — the analogue of
        vgg.lpips_features for the local-LPIPS variant, used by the
        engine's `--lpips_script lpips_tr` path. x in [-1, 1], [N,3,H,W]."""
        return embedding_from_params(self.params, self.lin, jnp.asarray(x),
                                     self.target_layers)

    def forward_tr(self, x, feat):
        """Mean distance of batch x to a *manifold* of precomputed feature
        lists (parity: lpips.py forward_tr used by calc_loss_lpips_tr):
        averages the pairwise layer distances over all (sample, target)
        pairs via the same sum-of-squares decomposition as losses.py."""
        fxs = self.extract_features(x)
        total = 0.0
        for tap, fx, ft in zip(self.target_layers, fxs, feat):
            w = jnp.maximum(self.lin[tap], 0.0)[None, :, None, None]
            a = (fx * jnp.sqrt(w)).reshape(fx.shape[0], -1)
            b = (ft * jnp.sqrt(w)).reshape(ft.shape[0], -1)
            hw = fx.shape[2] * fx.shape[3]
            aa = jnp.sum(jnp.square(a), axis=1)
            bb = jnp.sum(jnp.square(b), axis=1)
            ab = a @ b.T
            pair = aa[:, None] + bb[None, :] - 2.0 * ab  # [N, M]
            total = total + jnp.mean(pair) / hw
        return total

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
    """Learned perceptual distance over a backbone layer subset.

    Works on images in [-1, 1] (like the reference criterion).
    net_type: 'vgg' (default, VGG16 taps [16,23,30]), 'alex', or
    'squeeze' — the reference's three backbones
    (criteria/lpips/networks.py:12-20)."""

    def __init__(self, net_type="vgg", params=None, lin=None,
                 target_layers=None, report_dir=None):
        from ...models import lpips_backbones as bb

        if net_type == "vgg":
            self.target_layers = list(target_layers or DEFAULT_TARGET_LAYERS)
            self.params = params if params is not None else vgg.get_vgg16()
            channels = vgg.LPIPS_CHANNELS
            self._taps_fn = lambda p, x01: vgg.vgg_features(
                p, x01, taps=self.target_layers, input_range="0_255")
            self._input_scale = "0_255"
        elif net_type == "alex":
            self.target_layers = list(target_layers or bb.ALEX_TAPS)
            self.params = params if params is not None \
                else bb.init_alexnet(jax.random.PRNGKey(0))
            channels = bb.ALEX_CHANNELS
            self._taps_fn = bb.alexnet_taps
            self._input_scale = "pm1"
        elif net_type == "squeeze":
            self.target_layers = list(target_layers or bb.SQUEEZE_TAPS)
            self.params = params if params is not None \
                else bb.init_squeezenet(jax.random.PRNGKey(0))
            channels = bb.SQUEEZE_CHANNELS
            self._taps_fn = bb.squeezenet_taps
            self._input_scale = "pm1"
        else:
            raise NotImplementedError(
                "choose net_type from [alex, squeeze, vgg].")
        self.net_type = net_type
        if lin is not None:
            self.lin = lin
        else:
            base = self.params.get("lin", {}) if net_type == "vgg" else {}
            self.lin = {t: base.get(t, jnp.ones((channels[t],)))
                        for t in self.target_layers}
        self._extract = jax.jit(self._extract_impl)

    def _extract_impl(self, params, x):
        # params is a jit ARGUMENT, never a closure constant: closed-over
        # arrays are baked into the HLO as literals and the TPU relay
        # rejects the resulting >MB request bodies (CLAUDE.md).
        if self._input_scale == "0_255":
            # [-1,1] -> [0,255] for the shared VGG input convention.
            acts = self._taps_fn(params, (x + 1.0) * 127.5)
        else:
            acts = self._taps_fn(params, x)
        return [_normalize_act(acts[t].astype(jnp.float32))
                for t in self.target_layers]

    def extract_features(self, x):
        """[N,3,H,W] in [-1,1] -> list of unit-normalized activations."""
        return self._extract(self.params, jnp.asarray(x))

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
        engine's `--lpips_script lpips_tr` path. x in [-1, 1], [N,3,H,W].
        Works for every backbone (vgg/alex/squeeze)."""
        fxs = self.extract_features(x)
        outs = []
        for tap, fx in zip(self.target_layers, fxs):
            w = jnp.maximum(self.lin[tap], 0.0)[None, :, None, None]
            hw = float(fx.shape[2] * fx.shape[3])
            outs.append((fx * jnp.sqrt(w) / jnp.sqrt(hw))
                        .reshape(fx.shape[0], -1))
        return jnp.concatenate(outs, axis=1)

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

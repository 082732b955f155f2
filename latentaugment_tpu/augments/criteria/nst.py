"""Neural style transfer criterion (present-but-unused in the reference).

Parity: reference augments/criteria/nst/ — VGG19 split into style layers
(conv1_1..conv5_1) and a content layer (conv4_2), gram-matrix style loss
plus MSE content loss.
"""

import jax
import jax.numpy as jnp

from ...models import vgg

STYLE_LAYERS = ["conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1"]
CONTENT_LAYER = "conv4_2"


def gram_matrix(x):
    """[N, C, H, W] -> normalized gram [N, C, C]."""
    n, c, h, w = x.shape
    f = x.reshape(n, c, h * w)
    return jnp.einsum("ncx,ndx->ncd", f, f) / (c * h * w)


class VGG19Net:
    """VGG19 feature splitter for style/content activations."""

    def __init__(self, params=None, seed=0):
        self.params = params if params is not None else vgg.init_vgg(
            jax.random.PRNGKey(seed), plan=vgg.VGG19_PLAN, lpips_lin=False)
        taps = STYLE_LAYERS + [CONTENT_LAYER]
        # Params as a jit ARGUMENT, not a closure constant — closed-over
        # arrays bake into the HLO and break relay compiles (CLAUDE.md).
        self._run = jax.jit(lambda p, x: vgg.vgg_features(
            p, x, plan=vgg.VGG19_PLAN, taps=taps))

    def __call__(self, x):
        """[N,3,H,W] in [0,255] -> (style_acts list, content_act)."""
        acts = self._run(self.params, jnp.asarray(x))
        return [acts[t] for t in STYLE_LAYERS], acts[CONTENT_LAYER]


class NSTLoss:
    """style_weight * gram-MSE + content_weight * feature-MSE."""

    def __init__(self, net=None, style_weight=1e6, content_weight=1.0):
        self.net = net if net is not None else VGG19Net()
        self.style_weight = style_weight
        self.content_weight = content_weight

    def __call__(self, x, style_target, content_target):
        style_x, content_x = self.net(x)
        style_t, content_t = self.net(style_target)
        _, content_ref = self.net(content_target)
        style_loss = 0.0
        for sx, st in zip(style_x, style_t):
            style_loss = style_loss + jnp.mean(
                jnp.square(gram_matrix(sx) - gram_matrix(st)))
        content_loss = jnp.mean(jnp.square(content_x - content_ref))
        return self.style_weight * style_loss + self.content_weight * content_loss

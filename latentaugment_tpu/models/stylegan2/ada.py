"""Adaptive discriminator augmentation (ADA) pipeline, TPU-native.

The reference consumes StyleGAN2 checkpoints trained with NVIDIA's
stylegan2-ada (reference README.md:55-59 points users at the external
trainer); together with models/stylegan2/train.py this module closes
that last external-tool dependency natively. It re-implements the ADA
augmentation pipe (Karras et al. 2020, "Training GANs with Limited
Data") the TPU way:

- ONE jittable function `apply_ada(imgs, key, p, cfg)` with the overall
  augmentation probability `p` as a *traced scalar* — adapting p never
  recompiles.
- All geometric ops (xflip, 90-degree rotations, integer/fractional
  translation, isotropic/anisotropic scaling, rotation) compose into a
  single per-sample inverse 3x3 affine matrix and ONE bilinear
  grid_sample with reflection padding (ops/grid_sample.py, the
  framework's parity-tested sampler). NVIDIA's pipe materialises an
  upsampled intermediate and applies an orthogonal-wavelet low-pass per
  geometric step; on TPU that padding/filter chain is HBM-bandwidth
  noise for an *augmentation* — we sample once, bilinearly.
  (Deliberate, documented deviation: no wavelet anti-aliasing.)
- Color ops are per-sample scalars/3x3 color matrices fused by XLA into
  the surrounding elementwise chain. Luma-axis ops (lumaflip, hue,
  saturation) only apply to 3-channel images; the medical 2-channel
  pairs this framework targets get brightness/contrast (exactly the
  subset NVIDIA's pipe can meaningfully apply there too).
- Everything is differentiable w.r.t. the image (required: G's gradient
  flows through the augmentation in the Gmain phase).

The p-adaptation controller (`AdaController`) runs on host between
steps, implementing the r_t = E[sign(D(real))] heuristic with the ADA
defaults (target 0.6, ada_interval 4, ada_kimg 500).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample

# Per-op probability multipliers for the standard ADA presets.
_OP_NAMES = ('xflip', 'rotate90', 'xint', 'scale', 'rotate', 'aniso',
             'xfrac', 'brightness', 'contrast', 'lumaflip', 'hue',
             'saturation', 'noise', 'cutout')

PRESETS = {
    'blit':  dict(xflip=1, rotate90=1, xint=1),
    'geom':  dict(scale=1, rotate=1, aniso=1, xfrac=1),
    'color': dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1),
    'filter': dict(),   # imgfilter: not implemented (documented deviation)
    'noise': dict(noise=1),
    'cutout': dict(cutout=1),
}
PRESETS['bg'] = {**PRESETS['blit'], **PRESETS['geom']}
PRESETS['bgc'] = {**PRESETS['bg'], **PRESETS['color']}
PRESETS['bgcfnc'] = {**PRESETS['bgc'], **PRESETS['noise'], **PRESETS['cutout']}


def pipe_config(spec='bgc', **overrides):
    """Build an op-multiplier dict from a preset name or explicit kwargs."""
    cfg = {k: 0.0 for k in _OP_NAMES}
    if spec:
        cfg.update(PRESETS[spec])
    cfg.update({k: float(v) for k, v in overrides.items()})
    unknown = set(cfg) - set(_OP_NAMES)
    if unknown:
        raise ValueError(f'unknown ADA ops: {sorted(unknown)}')
    return cfg


def _gate(key, p, mult, n):
    """Per-sample bernoulli gate at probability min(p * mult, 1)."""
    return jax.random.bernoulli(key, jnp.clip(p * mult, 0.0, 1.0), (n,))


def _rot2(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([jnp.stack([c, -s, z], -1),
                      jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _translate2(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack([jnp.stack([o, z, tx], -1),
                      jnp.stack([z, o, ty], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _scale2(sx, sy):
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack([jnp.stack([sx, z, z], -1),
                      jnp.stack([z, sy, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def apply_ada(imgs, key, p, cfg, *,
              xint_max=0.125, scale_std=0.2, rotate_max=1.0,
              aniso_std=0.2, xfrac_std=0.125, brightness_std=0.2,
              contrast_std=0.5, hue_max=1.0, saturation_std=1.0,
              noise_std=0.1, cutout_size=0.5):
    """Augment imgs [N, C, H, W] with overall probability p (traced scalar).

    cfg is a dict of per-op probability multipliers (see pipe_config).
    Returns imgs of the same shape/dtype. Differentiable w.r.t. imgs.
    """
    n, c, h, w = imgs.shape
    assert h == w, 'ADA pipe expects square images'
    orig_dtype = imgs.dtype
    x = imgs.astype(jnp.float32)
    keys = iter(jax.random.split(key, 32))
    p = jnp.asarray(p, jnp.float32)

    # ---- geometric: accumulate the per-sample INVERSE transform M so the
    # sampling grid is src = M @ dst (ops composed in forward order T1..Tk
    # give M = T1^-1 @ ... @ Tk^-1, accumulated by right-multiplication).
    need_geom = any(cfg[k] for k in
                    ('xflip', 'rotate90', 'xint', 'scale', 'rotate',
                     'aniso', 'xfrac'))
    if need_geom:
        m = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))

        if cfg['xflip']:
            g = _gate(next(keys), p, cfg['xflip'], n)
            sx = jnp.where(g, -1.0, 1.0)
            m = m @ _scale2(sx, jnp.ones_like(sx))      # self-inverse
        if cfg['rotate90']:
            g = _gate(next(keys), p, cfg['rotate90'], n)
            k90 = jax.random.randint(next(keys), (n,), 0, 4)
            theta = jnp.where(g, k90.astype(jnp.float32), 0.0) * (np.pi / 2)
            m = m @ _rot2(-theta)
        if cfg['xint']:
            g = _gate(next(keys), p, cfg['xint'], n)
            # Integer pixel offsets, expressed in normalized [-1,1] units
            # (2/size per pixel) so the single sampling pass stays exact.
            t = jax.random.uniform(next(keys), (n, 2), minval=-xint_max,
                                   maxval=xint_max)
            tpix = jnp.round(t * jnp.array([w, h], jnp.float32))
            t = jnp.where(g[:, None], tpix, 0.0) * \
                (2.0 / jnp.array([w, h], jnp.float32))
            m = m @ _translate2(-t[:, 0], -t[:, 1])
        if cfg['scale']:
            g = _gate(next(keys), p, cfg['scale'], n)
            s = jnp.exp2(jax.random.normal(next(keys), (n,)) * scale_std)
            s = jnp.where(g, s, 1.0)
            m = m @ _scale2(1.0 / s, 1.0 / s)
        if cfg['rotate']:
            # ADA applies arbitrary rotation with prob p_rot = 1-sqrt(1-p)
            # before AND after aniso so the compound hits p overall.
            p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p * cfg['rotate'], 0.0, 1.0))
            g = jax.random.bernoulli(next(keys), p_rot, (n,))
            theta = jax.random.uniform(next(keys), (n,), minval=-np.pi,
                                       maxval=np.pi) * rotate_max
            theta = jnp.where(g, theta, 0.0)
            m = m @ _rot2(-theta)
        if cfg['aniso']:
            g = _gate(next(keys), p, cfg['aniso'], n)
            phi = jax.random.uniform(next(keys), (n,), minval=-np.pi,
                                     maxval=np.pi)
            r = jnp.exp2(jax.random.normal(next(keys), (n,)) * aniso_std)
            r = jnp.where(g, r, 1.0)
            # forward T = R(phi) S(r, 1/r) R(-phi)  ->  inverse swaps r.
            m = m @ (_rot2(phi) @ _scale2(1.0 / r, r) @ _rot2(-phi))
        if cfg['rotate']:
            p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p * cfg['rotate'], 0.0, 1.0))
            g = jax.random.bernoulli(next(keys), p_rot, (n,))
            theta = jax.random.uniform(next(keys), (n,), minval=-np.pi,
                                       maxval=np.pi) * rotate_max
            theta = jnp.where(g, theta, 0.0)
            m = m @ _rot2(-theta)
        if cfg['xfrac']:
            g = _gate(next(keys), p, cfg['xfrac'], n)
            t = jax.random.normal(next(keys), (n, 2)) * xfrac_std * 2.0
            t = jnp.where(g[:, None], t, 0.0)
            m = m @ _translate2(-t[:, 0], -t[:, 1])

        # dst pixel-center grid in [-1,1] (align_corners=False convention).
        xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
        ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
        gx, gy = jnp.meshgrid(xs, ys)                       # [H, W]
        dst = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)    # [H, W, 3]
        src = jnp.einsum('nij,hwj->nhwi', m, dst)           # [N, H, W, 3]
        grid = src[..., :2]
        x = grid_sample(x, grid, padding_mode='reflection',
                        align_corners=False)

    # ---- color -------------------------------------------------------
    if cfg['brightness']:
        g = _gate(next(keys), p, cfg['brightness'], n)
        b = jax.random.normal(next(keys), (n,)) * brightness_std
        x = x + jnp.where(g, b, 0.0)[:, None, None, None]
    if cfg['contrast']:
        g = _gate(next(keys), p, cfg['contrast'], n)
        s = jnp.exp2(jax.random.normal(next(keys), (n,)) * contrast_std)
        x = x * jnp.where(g, s, 1.0)[:, None, None, None]
    if c == 3 and (cfg['lumaflip'] or cfg['hue'] or cfg['saturation']):
        v = jnp.full((3,), 1.0 / np.sqrt(3.0), jnp.float32)  # luma axis
        flat = x.reshape(n, 3, -1)
        if cfg['lumaflip']:
            g = _gate(next(keys), p, cfg['lumaflip'], n)
            proj = jnp.einsum('c,ncs->ns', v, flat)
            refl = flat - 2.0 * v[None, :, None] * proj[:, None, :]
            flat = jnp.where(g[:, None, None], refl, flat)
        if cfg['hue']:
            g = _gate(next(keys), p, cfg['hue'], n)
            theta = jax.random.uniform(next(keys), (n,), minval=-np.pi,
                                       maxval=np.pi) * hue_max
            theta = jnp.where(g, theta, 0.0)
            # Rodrigues rotation of the color vector around the luma axis:
            # skew(v) @ x == v cross x.
            kx = jnp.array([[0.0, -v[2], v[1]],
                            [v[2], 0.0, -v[0]],
                            [-v[1], v[0], 0.0]], jnp.float32)
            cos, sin = jnp.cos(theta), jnp.sin(theta)
            vvt = jnp.outer(v, v)
            rot = (cos[:, None, None] * jnp.eye(3)
                   + sin[:, None, None] * kx[None]
                   + (1 - cos)[:, None, None] * vvt[None])
            flat = jnp.einsum('nij,njs->nis', rot, flat)
        if cfg['saturation']:
            g = _gate(next(keys), p, cfg['saturation'], n)
            s = jnp.exp2(jax.random.normal(next(keys), (n,)) * saturation_std)
            s = jnp.where(g, s, 1.0)
            proj = jnp.einsum('c,ncs->ns', v, flat)[:, None, :] * v[None, :, None]
            flat = proj + (flat - proj) * s[:, None, None]
        x = flat.reshape(n, 3, h, w)

    # ---- corruptions --------------------------------------------------
    if cfg['noise']:
        g = _gate(next(keys), p, cfg['noise'], n)
        sigma = jnp.abs(jax.random.normal(next(keys), (n,))) * noise_std
        sigma = jnp.where(g, sigma, 0.0)
        x = x + sigma[:, None, None, None] * \
            jax.random.normal(next(keys), x.shape)
    if cfg['cutout']:
        g = _gate(next(keys), p, cfg['cutout'], n)
        center = jax.random.uniform(next(keys), (n, 2))
        size = cutout_size / 2.0
        cx = center[:, 0][:, None] - \
            (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        cy = center[:, 1][:, None] - \
            (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        mask = (jnp.abs(cx)[:, None, :] >= size) | \
               (jnp.abs(cy)[:, :, None] >= size)       # [N, H, W]
        mask = jnp.where(g[:, None, None], mask, True)
        x = x * mask[:, None, :, :].astype(x.dtype)

    return x.astype(orig_dtype)


class AdaController:
    """Host-side p-adaptation: r_t = E[sign(D(real))] drives p toward
    keeping r_t at `target` (ADA section 3: overfitting heuristic)."""

    def __init__(self, target=0.6, interval=4, ada_kimg=500, p_init=0.0):
        self.target = float(target)
        self.interval = int(interval)
        self.ada_kimg = float(ada_kimg)
        self.p = float(p_init)
        self._sign_sum = 0.0
        self._n_seen = 0
        self._ticks = 0

    def state_dict(self):
        """Serializable controller state (hyperparameters come from the
        train config; only the evolving accumulator state is saved)."""
        return dict(p=self.p, sign_sum=self._sign_sum,
                    n_seen=self._n_seen, ticks=self._ticks)

    def load_state_dict(self, sd):
        self.p = float(sd['p'])
        self._sign_sum = float(sd['sign_sum'])
        self._n_seen = int(sd['n_seen'])
        self._ticks = int(sd['ticks'])

    def will_tick(self, n_pending):
        """True iff feeding `n_pending` more steps reaches a tick — lets
        the training loop defer the per-step host fetch of rt to tick
        boundaries (p only changes at ticks, so deferral is exact; the
        per-step device→host sync costs ~44 ms/step on the relay,
        BENCH_NOTES.md)."""
        return self._ticks + int(n_pending) >= self.interval

    def update(self, real_sign_mean, batch_size):
        """Feed mean(sign(D(real_logits))) for one step; returns p."""
        self._sign_sum += float(real_sign_mean) * batch_size
        self._n_seen += batch_size
        self._ticks += 1
        if self._ticks >= self.interval and self._n_seen > 0:
            rt = self._sign_sum / self._n_seen
            adjust = np.sign(rt - self.target) * \
                self._n_seen / (self.ada_kimg * 1000.0)
            self.p = float(np.clip(self.p + adjust, 0.0, 1.0))
            self._sign_sum = 0.0
            self._n_seen = 0
            self._ticks = 0
        return self.p

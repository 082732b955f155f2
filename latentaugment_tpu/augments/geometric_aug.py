"""Geometric (classical) augmentation policy in pure JAX.

Parity: reference augments/geometric_aug.py — RandomHorizontalFlip,
RandomAffine (degrees/translate, reflection padding), and
RandomElasticTransform, each applied per-sample with probability
`1 - p_thres`, composed sequentially. The kornia GPU kernels become a
single jitted, vmapped program built on ops.grid_sample (reflection
padding), so the whole batch transforms in one device launch.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import grid_sample
from ..utils import util_path
from .base_aug import BaseAugment
from .latent_aug import visualize


def _identity_grid(h, w):
    """[H, W, 2] normalized (x, y) sampling grid, align_corners=False."""
    ys = (jnp.arange(h) + 0.5) / h * 2.0 - 1.0
    xs = (jnp.arange(w) + 0.5) / w * 2.0 - 1.0
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def _gaussian_kernel1d(kernel_size, sigma):
    x = np.arange(kernel_size, dtype=np.float32) - (kernel_size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum())


def random_hflip(key, x, p):
    """Per-sample horizontal flip with probability p."""
    n = x.shape[0]
    mask = jax.random.bernoulli(key, p, (n, 1, 1, 1))
    return jnp.where(mask, x[..., ::-1], x)


def _normal_transform_pixel(h, w):
    """kornia normal_transform_pixel: pixel coords -> [-1, 1] using the
    (size - 1) denominators (geometry.transform.imgwarp; this is kornia's
    convention even when the final grid_sample uses align_corners=False —
    the quirk is reproduced, not repaired, for oracle parity)."""
    return jnp.asarray([[2.0 / (w - 1), 0.0, -1.0],
                        [0.0, 2.0 / (h - 1), -1.0],
                        [0.0, 0.0, 1.0]], dtype=jnp.float32)


def affine_warp(x, angle_deg, translate_px):
    """Deterministic core of kornia RandomAffine on fixed parameters.

    Reproduces get_affine_matrix2d (OpenCV rotation about the image center
    ((W-1)/2, (H-1)/2) with the angle NEGATED, pixel translations added to
    the matrix's last column) -> warp_affine (normalize_homography, invert,
    affine_grid + grid_sample with align_corners=False, reflection padding).
    angle_deg: [N] degrees; translate_px: [N, 2] (dx, dy) in pixels.
    Oracle: tests/reference_oracles.py kornia_affine_oracle."""
    n, c, h, w = x.shape
    ang = -jnp.asarray(angle_deg, jnp.float32) * (np.pi / 180.0)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    tx, ty = translate_px[:, 0], translate_px[:, 1]
    zeros, ones = jnp.zeros_like(cos), jnp.ones_like(cos)
    m = jnp.stack([
        jnp.stack([cos, sin, (1.0 - cos) * cx - sin * cy + tx], axis=-1),
        jnp.stack([-sin, cos, sin * cx + (1.0 - cos) * cy + ty], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)  # [N, 3, 3] src->dst pixel homography
    norm = _normal_transform_pixel(h, w)
    dst_norm_trans_src_norm = norm[None] @ m @ jnp.linalg.inv(norm)[None]
    theta = jnp.linalg.inv(dst_norm_trans_src_norm)  # dst norm -> src norm
    base = _identity_grid(h, w)  # F.affine_grid(align_corners=False) base
    gxy1 = jnp.concatenate([base, jnp.ones((h, w, 1))], axis=-1)
    src = jnp.einsum('nij,hwj->nhwi', theta, gxy1)[..., :2]
    return grid_sample(x, src, padding_mode='reflection', align_corners=False)


def random_affine(key, x, p, degrees, translate):
    """Per-sample rotation (+-degrees) and translation (+-translate frac),
    reflection padding — kornia RandomAffine parameter sampling: dx ~
    U(-t*W, t*W) pixels, dy ~ U(-t*H, t*H) pixels."""
    n, c, h, w = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    angle = jax.random.uniform(k1, (n,), minval=-degrees, maxval=degrees)
    tx = jax.random.uniform(k2, (n,), minval=-translate, maxval=translate) * w
    ty = jax.random.uniform(k3, (n,), minval=-translate, maxval=translate) * h
    apply = jax.random.bernoulli(k4, p, (n,))
    warped = affine_warp(x, angle, jnp.stack([tx, ty], axis=-1))
    return jnp.where(apply[:, None, None, None], warped, x)


def elastic_warp(x, noise, kernel_size=63, sigma=32.0, alpha=1.0):
    """Deterministic core of kornia elastic_transform2d on a fixed noise
    field [N, 2, H, W]: gaussian-smooth the displacement channels
    (border_type='constant' = zero padding; the normalized 2-D kernel is
    an outer product, so two 1-D passes are exact), scale by alpha, add to
    kornia's create_meshgrid grid (linspace(-1, 1, size) — align_corners=
    True spacing, another reproduced kornia quirk), CLAMP to [-1, 1], and
    grid_sample with align_corners=False + reflection padding.
    Oracle: tests/reference_oracles.py kornia_elastic_oracle."""
    n, c, h, w = x.shape
    kern = _gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2
    from jax import lax

    kx = jnp.tile(kern.reshape(1, 1, 1, kernel_size), (2, 1, 1, 1))
    ky = jnp.tile(kern.reshape(1, 1, kernel_size, 1), (2, 1, 1, 1))
    smooth = lax.conv_general_dilated(noise, kx, (1, 1), ((0, 0), (pad, pad)),
                                      dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                                      feature_group_count=2)
    smooth = lax.conv_general_dilated(smooth, ky, (1, 1), ((pad, pad), (0, 0)),
                                      dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                                      feature_group_count=2)
    disp = smooth * alpha
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy], axis=-1)[None] + jnp.moveaxis(disp, 1, -1)
    grid = jnp.clip(grid, -1.0, 1.0)
    return grid_sample(x, grid, padding_mode='reflection', align_corners=False)


def random_elastic(key, x, p, kernel_size=63, sigma=32.0, alpha=1.0):
    """Per-sample elastic warp (kornia RandomElasticTransform: noise ~
    U(-1, 1) per displacement channel)."""
    n = x.shape[0]
    k1, k2 = jax.random.split(key)
    noise = jax.random.uniform(k1, (n, 2) + x.shape[2:], minval=-1.0,
                               maxval=1.0)
    warped = elastic_warp(x, noise, kernel_size, sigma, alpha)
    apply = jax.random.bernoulli(k2, p, (n,))
    return jnp.where(apply[:, None, None, None], warped, x)


class GeometricAugment(BaseAugment):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument('--p_thres', type=float, default=0.5, help='Augmentation probability.')
        parser.add_argument('--horizontal_flip', action='store_true', help='If specified, flip the images for augmentation')
        parser.add_argument('--affine', action='store_true', help='If specified, rotate|shift|scale images for augmentation')
        parser.add_argument('--elastic_deform', action='store_true', help='If specified, elastic deform the images for augmentation')
        parser.add_argument('--rotate_limit', type=float, default=3, help='Rotation range (-rotate_limit, rotate_limit) in [DEGREE]')
        parser.add_argument('--shift_limit', type=float, default=0.05, help='Shift as a fraction of the image height/width')
        from ..options.base_options import str2bool
        parser.add_argument('--verbose_log', help='Print losses and time during the optimization process.', type=str2bool, default=False)
        return parser

    def __init__(self, opt):
        BaseAugment.__init__(self, opt)
        self.phase = opt.phase
        self.p_thres = opt.p_thres
        self.horizontal_flip = opt.horizontal_flip
        self.affine = opt.affine
        self.elastic_deform = opt.elastic_deform
        self.rotate_limit = opt.rotate_limit
        self.shift_limit = opt.shift_limit
        self.verbose_log = opt.verbose_log
        self.stats_time = []
        self._key = jax.random.PRNGKey(getattr(opt, 'seed', 42))

        if opt.phase == 'train':
            print('')
            print('Train phase.')
            self.transform = self.get_train_transform()
        elif self.phase in ('val', 'test'):
            print('')
            print('Val/Test phase.')
            print('All augmentation disabled.')
            # Identity pass-through so the shared driver loop can still
            # call forward() (the reference leaves self.transform unset
            # and crashes here; LatentAugment no-ops, so match that).
            self.transform = lambda key, x: x
        else:
            raise NotImplementedError

    def input_sanity_check(self, img):
        res = getattr(self.opt, 'load_size', 256)
        assert isinstance(img, np.ndarray)
        assert img.dtype == np.float32
        assert img.shape == (1, res, res)

    output_sanity_check = input_sanity_check

    def set_input(self, data):
        assert data['A_paths'] == data['B_paths']
        self.real_A = np.asarray(data['A'], dtype=np.float32)
        self.real_B = np.asarray(data['B'], dtype=np.float32)
        self.fname = data['A_paths']
        self.real_AB = np.concatenate((self.real_A, self.real_B), axis=1)

    def get_output(self):
        real_AB_aug = np.asarray(self.real_AB_aug, dtype=np.float32)
        return {'A': real_AB_aug[:, 0:1], 'B': real_AB_aug[:, 1:2],
                'A_paths': self.fname, 'B_paths': self.fname}

    def get_train_transform(self):
        """Compose the enabled transforms into one jitted callable."""
        p = 1.0 - self.p_thres
        use_flip, use_affine, use_elastic = (self.horizontal_flip, self.affine,
                                             self.elastic_deform)
        degrees, translate = float(self.rotate_limit), float(self.shift_limit)
        if use_flip:
            print('Horizontal flip ON')
        if use_affine:
            print('Affine ON')
        if use_elastic:
            print('Elastic deform ON')

        @jax.jit
        def apply(key, x):
            k1, k2, k3 = jax.random.split(key, 3)
            if use_flip:
                x = random_hflip(k1, x, p)
            if use_affine:
                x = random_affine(k2, x, p, degrees, translate)
            if use_elastic:
                x = random_elastic(k3, x, p)
            return x

        return apply

    def forward(self):
        since = time.time()
        self._key, k = jax.random.split(self._key)
        out = self.transform(k, jnp.asarray(self.real_AB))
        self.real_AB_aug = np.asarray(out)
        time_elapsed = time.time() - since
        self.stats_time.append(time_elapsed)
        if self.verbose_log:
            print('Augmentation completed in {:.0f}m {:.3f}s'.format(
                time_elapsed // 60, time_elapsed % 60))

    def sanity_check(self):
        fname = self.fname[0]
        self.input_sanity_check(self.real_A[0])
        self.input_sanity_check(self.real_B[0])
        visualize(self.real_A[0], self.real_B[0],
                  util_path.get_filename_without_extension(fname), self.save_dir)
        self.forward()
        data = self.get_output()
        self.output_sanity_check(data['A'][0])
        self.output_sanity_check(data['B'][0])
        visualize(data['A'][0], data['B'][0],
                  util_path.get_filename_without_extension(data['A_paths'][0]) + 'aug',
                  self.save_dir)

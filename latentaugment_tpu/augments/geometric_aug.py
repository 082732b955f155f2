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


def random_affine(key, x, p, degrees, translate):
    """Per-sample rotation (+-degrees) and translation (+-translate frac),
    reflection padding — matching kornia RandomAffine semantics."""
    n, c, h, w = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    theta = jax.random.uniform(k1, (n,), minval=-degrees, maxval=degrees) * np.pi / 180.0
    tx = jax.random.uniform(k2, (n,), minval=-translate, maxval=translate) * 2.0
    ty = jax.random.uniform(k3, (n,), minval=-translate, maxval=translate) * 2.0
    apply = jax.random.bernoulli(k4, p, (n,))

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    base = _identity_grid(h, w)[None]  # [1, H, W, 2]
    gx, gy = base[..., 0], base[..., 1]
    # Inverse map: output pixel samples from rotated+translated input coords.
    sx = cos[:, None, None] * gx + sin[:, None, None] * gy - tx[:, None, None]
    sy = -sin[:, None, None] * gx + cos[:, None, None] * gy - ty[:, None, None]
    grid = jnp.stack([sx, sy], axis=-1)
    warped = grid_sample(x, grid, padding_mode='reflection', align_corners=False)
    return jnp.where(apply[:, None, None, None], warped, x)


def random_elastic(key, x, p, kernel_size=63, sigma=32.0, alpha=1.0):
    """Per-sample elastic warp: smoothed uniform displacement field added to
    the sampling grid (kornia RandomElasticTransform semantics)."""
    n, c, h, w = x.shape
    k1, k2 = jax.random.split(key)
    noise = jax.random.uniform(k1, (n, 2, h, w), minval=-1.0, maxval=1.0)
    kern = _gaussian_kernel1d(kernel_size, sigma)
    pad = kernel_size // 2
    # Separable smoothing of the displacement field.
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
    grid = _identity_grid(h, w)[None] + jnp.moveaxis(disp, 1, -1)
    warped = grid_sample(x, grid, padding_mode='reflection', align_corners=False)
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
        parser.add_argument('--verbose_log', help='Print losses and time during the optimization process.', type=bool, default=False)
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

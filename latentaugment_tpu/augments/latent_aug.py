"""LatentAugment policy — the public augment for paired medical images.

Parity: reference augments/latent_aug.py — same CLI options, the
p_thres train-only gate, rand_aug mode (zeroes all loss weights and
samples z ~ N(0, I)), w lookup from the inversion zip, A/B channel
concat, output split with optional lower-bound clip, latent in/out
accessors, per-batch wall-time stats, and sanity_check PNG dumps.

Data stays NumPy at the API boundary (NCHW float32, like the torch
contract); the engine moves it to device with batch sharding.
"""

import os
import pickle
import random
import time

import jax
import numpy as np

from ..utils import util_path
from . import engine as engine_mod
from .base_aug import BaseAugment


def reverse_broadcasting(latent):
    """[B, num_ws, w_dim] -> [B, 1, w_dim]."""
    return latent[:, :1, :]


def map_range(x, old_min=-1000, old_max=2000, new_min=-1, new_max=1):
    return (((x - old_min) * (new_max - new_min)) / (old_max - old_min)) + new_min


class LatentAugment(BaseAugment):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument('--model_dir', help='Where to load the StyleGAN pretrained model', metavar='DIR', required=True)
        parser.add_argument('--interim_dir', help='Where to save/load the data', metavar='DIR', required=True)
        parser.add_argument('--gpu_ids_aug', type=str, default='0', help='kept for CLI compatibility (JAX manages devices)')
        parser.add_argument('--n_mesh_devices', type=int, default=0, help='shard the batch over this many devices (0 = single device)')
        parser.add_argument('--n_model_devices', type=int, default=0, help='tensor parallelism: shard conv output channels over this many devices inside each data-parallel group (0/1 = off; must divide n_mesh_devices)')

        # Common dataset options.
        parser.add_argument('--dataset_aug', help='', metavar='DIR', default="Pelvis_2.1_repo_no_mask")
        parser.add_argument('--dataset_name_aug', help='', metavar='DIR', default="Pelvis_2.1_repo_no_mask-num-375_train-0.70_val-0.20_test-0.10")
        parser.add_argument('--modalities_aug', help='', metavar='DIR', default="MR_nonrigid_CT,MR_MR_T2")
        parser.add_argument('--img_resolution', help='Image resolution.', type=int, default=256)
        # StyleGAN options.
        parser.add_argument('--exp_stylegan', help='', metavar='DIR', default="00003")
        parser.add_argument('--network_pkl_stylegan', help='', metavar='DIR', default="network-snapshot-005320.pkl")
        # Inversion options.
        parser.add_argument('--dataset_w_name', help='', metavar='DIR', default="Pelvis_2.1_repo_no_mask-num-375_train-0.70_val-0.20_test-0.10-expinv_00001")
        parser.add_argument('--exp_inv', help='', metavar='DIR', default="00001")
        parser.add_argument('--network_pkl_inv', help='', metavar='DIR', default="")

        # Augmentation options.
        parser.add_argument('--truncation_psi', help='Truncation value.', type=float, default=1.0)
        parser.add_argument('--rand_aug', action='store_true', help='Compute only random GAN augmentation.')
        parser.add_argument('--lower_bound_clip', action='store_true', help='Clip the pixels values under -1 to -1.')
        parser.add_argument('--step_img', help='Selection step to create the image dataset from which compute the distances.', type=int, default=20)
        parser.add_argument('--step_w', help='Selection step to create the latent dataset from which compute the distances.', type=int, default=5)
        parser.add_argument('--lpips_script', help='How to extract the features manifold.', type=str, default='lpips_script')
        parser.add_argument('--lpips_ref_input', help='Feed raw [-1,1] synthetic crops to the LPIPS VGG (exact reference parity; default uses a consistent [0,255] scale — see PARITY.md).', action='store_true')
        parser.add_argument('--opt_num_epochs', help='Number of optimization steps', type=int, default=10)
        parser.add_argument('--opt_lr', help='Learning rate of optimization algorithm', type=float, default=0.01)
        parser.add_argument('--init_w', help='Initialization point for latent codes [inv | random]', type=str, default='random')

        parser.add_argument('--crop_size_aug', help='Size of the crop applied to images.', type=int, default=64)
        parser.add_argument('--preprocess_aug', help='Type of preprocessing [center_crop | random_crop | center_random_crop | original]', type=str, default='center_random_crop')

        parser.add_argument('--w_pix', help='Weight of recontruction loss', type=float, default=1.0)
        parser.add_argument('--w_lpips', help='Weight of lpips loss', type=float, default=1.0)
        parser.add_argument('--w_latent', help='Weight of latent loss', type=float, default=1.0)
        parser.add_argument('--w_disc', help='Weight of discriminator loss.', type=float, default=1.0)

        parser.add_argument('--num_fp16_res', help='Run the top-N resolution blocks of G/D in bfloat16 (halves HBM, feeds the MXU natively; 0 = full fp32).', type=int, default=4)
        from ..options.base_options import str2bool
        parser.add_argument('--p_thres', help='Augmentation probability.', type=float, default=1.0)
        parser.add_argument('--soft_aug', help='Activate smooth augmentation via interpolation.', type=str2bool, default=False)
        parser.add_argument('--alpha', help='Value for linear interpolation in soft_aug.', type=float, default=1.0)
        parser.add_argument('--verbose_log', help='Print losses and time during the optimization process.', type=str2bool, default=False)
        return parser

    def __init__(self, opt):
        BaseAugment.__init__(self, opt)

        self.phase = opt.phase
        self.batch_size = opt.batch_size
        self.rand_aug = opt.rand_aug
        self.lower_bound_clip = opt.lower_bound_clip
        self.p_thres = opt.p_thres
        self.init_w = opt.init_w
        self.verbose_log = opt.verbose_log
        self.stats_time = []
        self._rng = random.Random(getattr(opt, 'seed', 42))
        self._key = jax.random.PRNGKey(getattr(opt, 'seed', 42))
        self.augmented = False
        self.w_AB = self.w_AB_aug = None

        if self.phase == 'train':
            print('')
            print('Train phase.')
            if self.rand_aug:
                print('Random GAN augmentation! Disable latent aug parameters.')
                opt.w_pix = 0.0
                opt.w_lpips = 0.0
                opt.w_latent = 0.0
                opt.w_disc = 0.0
                opt.init_w = 'random'
                self.init_w = opt.init_w
                opt.opt_num_epochs = 0
                opt.soft_aug = False
            if self.lower_bound_clip:
                print('Clip pixel values under -1 to -1.')

            mesh = None
            n_mesh = getattr(opt, 'n_mesh_devices', 0)
            n_model = getattr(opt, 'n_model_devices', 0) or 1
            if n_model > 1 and not (n_mesh and n_mesh > 1):
                raise ValueError(
                    f"--n_model_devices {n_model} requires --n_mesh_devices "
                    "(the total device count the ('data','model') mesh is "
                    "built from); without it the TP request would be "
                    "silently dropped")
            if n_mesh and n_mesh > 1:
                from ..parallel import get_mesh
                mesh = get_mesh(n_mesh, n_model=n_model)

            self.latent_aug = engine_mod.define_latentaugment(
                module_name='latent_aug', phase=opt.phase, opt=opt,
                save_dir=self.save_dir, mesh=mesh)
            self.stats_dataset_w = self.latent_aug.stats_dataset_w
            self.num_ws = self.latent_aug.num_ws
            self.w_dim = self.latent_aug.w_dim
            self.z_dim = self.latent_aug.z_dim
        elif self.phase in ('val', 'test'):
            print('')
            print('Val/Test phase.')
            print('All augmentation disabled.')
        else:
            raise NotImplementedError

    # ------------------------------------------------------------------

    def input_sanity_check(self, img):
        # Parity: latent_aug.py:159-169 asserts (1, 256, 256); generalized
        # to the configured resolution.
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
        # The loader yields a final partial batch; the compiled walk runs
        # at the static batch_size, so inputs are padded up and every
        # accessor trims back to the real row count.
        self._n_valid = len(self.fname)
        self.real_AB = np.concatenate((self.real_A, self.real_B), axis=1)

    def get_output(self):
        real_AB_aug = np.asarray(self.real_AB_aug,
                                 dtype=np.float32)[:self._n_valid]
        real_A_aug = real_AB_aug[:, 0:1, :, :]  # CT
        real_B_aug = real_AB_aug[:, 1:2, :, :]  # MRI

        if self.lower_bound_clip:
            if real_A_aug.min() < -1:
                real_A_aug = np.clip(real_A_aug, -1.0, None)
            if real_B_aug.min() < -1:
                real_B_aug = np.clip(real_B_aug, -1.0, None)

        return {'A': real_A_aug, 'B': real_B_aug,
                'A_paths': self.fname, 'B_paths': self.fname}

    def get_latent_output(self):
        if self.w_AB_aug is None:
            raise RuntimeError(
                "augmentation was skipped for this batch (p_thres gate or "
                "val/test phase); no augmented latents to fetch — guard on "
                "`augment.augmented`")
        w_aug = reverse_broadcasting(
            np.asarray(self.w_AB_aug)[:self._n_valid])
        w_aug = np.squeeze(w_aug)
        return {'w': w_aug, 'paths': self.fname if not self.rand_aug else ''}

    def get_latent_input(self):
        if self.w_AB is None:
            raise RuntimeError(
                "augmentation was skipped for this batch (p_thres gate or "
                "val/test phase); no input latents to fetch — guard on "
                "`augment.augmented`")
        w = np.squeeze(np.asarray(self.w_AB)[:self._n_valid])
        return {'w': w, 'paths': self.fname if not self.rand_aug else ''}

    def forward(self):
        """Gate on p_thres, then run the compiled walk / ganrand path."""
        since = time.time()
        self._key, key = jax.random.split(self._key)
        if self._rng.random() > self.p_thres and self.phase == 'train':
            self.augmented = True
            if self.rand_aug:
                w_AB = self.sample_from_randn()
                self.real_AB_aug, self.w_AB_aug = \
                    self.latent_aug.forward_ganrand(w_AB, key=key)
                self.w_AB = self.w_AB_aug
            else:
                if self.init_w == 'random':
                    raise NotImplementedError
                elif self.init_w == 'inv':
                    self.w_AB = self.sample_from_inversion(self.fname)
                else:
                    raise NotImplementedError
                self.real_AB_aug, self.w_AB_aug = \
                    self.latent_aug.forward(self.w_AB, self.fname, key=key)
            # Materialize host-side once: timing needs the transfer, and
            # get_output would otherwise re-fetch the whole batch.
            self.real_AB_aug = np.asarray(self.real_AB_aug)
            time_elapsed = time.time() - since
            if self.verbose_log:
                print('Augmentation completed in {:.0f}m {:.3f}s'.format(
                    time_elapsed // 60, time_elapsed % 60))
        else:
            # No latents exist for a skipped batch. The reference leaves
            # the previous batch's w_AB/w_AB_aug dangling, so its driver
            # dumps stale latents under the current fname; clearing them
            # turns that silent corruption into a guarded error.
            self.augmented = False
            self.w_AB = self.w_AB_aug = None
            self.real_AB_aug = np.concatenate((self.real_A, self.real_B), axis=1)
            time_elapsed = time.time() - since
            if self.verbose_log:
                print('No augmentation, time {:.0f}m {:.3f}s'.format(
                    time_elapsed // 60, time_elapsed % 60))
        self.stats_time.append(time_elapsed)

    # ------------------------------------------------------------------

    def sanity_check(self):
        fname = self.fname[0]
        real_A = self.real_A[0]
        real_B = self.real_B[0]
        self.input_sanity_check(real_A)
        self.input_sanity_check(real_B)
        visualize(real_A, real_B,
                  util_path.get_filename_without_extension(fname), self.save_dir)

        self.forward()
        data = self.get_output()

        real_A_aug = data['A'][0]
        real_B_aug = data['B'][0]
        fname_aug = data['A_paths'][0]
        self.output_sanity_check(real_A_aug)
        self.output_sanity_check(real_B_aug)
        visualize(real_A_aug, real_B_aug,
                  util_path.get_filename_without_extension(fname_aug) + 'aug',
                  self.save_dir)

    # ------------------------------------------------------------------

    def sample_from_randn(self):
        self._key, k = jax.random.split(self._key)
        return np.asarray(jax.random.normal(k, (self.batch_size, self.z_dim)))

    def sample_from_inversion(self, fname):
        assert len(fname) > 0
        w = np.empty((self.batch_size, self.num_ws, self.w_dim), dtype=np.float32)
        for i, fn in enumerate(fname):
            with self.stats_dataset_w.open_file(fn) as f:
                out_w = pickle.load(f)
            w[i] = np.asarray(out_w, dtype=np.float32)
        # Pad a partial final batch by repeating the last real row (the
        # walk is compiled at the static batch_size; np.empty left the
        # tail uninitialized). Accessors trim back to _n_valid.
        w[len(fname):] = w[len(fname) - 1]
        w = reverse_broadcasting(w)
        assert w.shape == (self.batch_size, 1, self.w_dim)
        return w


def visualize(imgA, imgB, img_name, save_dir):
    imgA = np.asarray(imgA)
    imgB = np.asarray(imgB)
    if imgA.ndim == 2:
        img = np.concatenate([imgA, imgB], axis=1)
    else:
        img = np.concatenate([imgA[0], imgB[0]], axis=1)
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=plt.figaspect(img))
        fig.subplots_adjust(0, 0, 1, 1)
        ax.imshow(img, cmap='gray')
        plt.axis('off')
        fig.savefig(os.path.join(save_dir, f"{img_name}.png"), dpi=150, format='png')
        plt.close(fig)
    except ImportError:
        pass

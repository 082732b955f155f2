"""LatentAugment sweep driver (parity: reference backbone_latentaug.py).

Random-search over the parameter space, dumping augmented image/latent
pickles for offline metric evaluation, and reporting mean per-batch
augmentation wall-time (first batch discarded — the throughput number
BASELINE.md tracks).
"""

import copy
import os
import random

import numpy as np

from latentaugment_tpu.options import AugOptions
from latentaugment_tpu.augments import create_augment
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.utils import util_io, util_path

# Tuned operating point (reference backbone_latentaug.py:46-54).
params_space = {
    'w_lpips': [10],
    'w_pix': [0.1],
    'w_latent': [0.001],
    'w_disc': [0.01],
    'p_thres': [0.0],
    'opt_num_epochs': [6],
    'opt_lr': [0.01],
}

n_imgs = int(os.environ.get('LATENTAUGMENT_N_IMGS', 10000))


def main():
    for index_exp in range(1):
        print(f'Performing iteration: {index_exp}')
        params = copy.deepcopy(params_space)
        for key in params_space:
            params[key] = random.choice(params_space[key])
        params['n_imgs'] = n_imgs
        print('Parameters.')
        print(params)

        opt = AugOptions().parse(args=params)

        outdir = os.path.join(opt.checkpoints_dir, opt.name)
        for outname in ['img', 'latent', 'img_aug', 'latent_aug']:
            util_path.create_dir(os.path.join(outdir, outname))

        dataset = create_dataset(opt)
        print('The number of training images = %d' % len(dataset))

        augment = create_augment(opt)

        # Sanity check for augmentation class.
        data = next(iter(dataset))
        augment.set_input(data)
        augment.sanity_check()

        n_iter = n_imgs // opt.batch_size
        for i, data in enumerate(dataset):
            print(f"Iteration: {i} of {n_iter}")
            if i >= n_iter:
                break

            augment.set_input(data)
            augment.forward()

            data_aug = augment.get_output()
            util_io.write_pickle(data, os.path.join(outdir, 'img', f'img_{i}'))
            util_io.write_pickle(data_aug, os.path.join(outdir, 'img_aug', f'img_aug_{i}'))
            # Latents exist only for batches the p_thres gate augmented;
            # the reference dumps the PREVIOUS batch's (stale) latents
            # here (backbone_latentaug.py:107-119).
            if getattr(augment, 'augmented', False):
                data_w = augment.get_latent_input()
                data_w_aug = augment.get_latent_output()
                util_io.write_pickle(data_w, os.path.join(outdir, 'latent', f'w_{i}'))
                util_io.write_pickle(data_w_aug, os.path.join(outdir, 'latent_aug', f'w_aug_{i}'))

        stats_time = augment.stats_time[1:]
        print(np.mean(stats_time))

    print('May the force be with you.')


if __name__ == '__main__':
    main()

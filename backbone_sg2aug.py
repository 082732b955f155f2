"""Random-GAN augmentation sweep driver (parity: reference backbone_sg2aug.py).

Sweeps truncation_psi values of the rand_aug (sampling-only) path,
dumping augmented images/latents for offline metric evaluation.
Run with --rand_aug on the CLI (the reference relies on the flag too).
"""

import os

import numpy as np

from latentaugment_tpu.options import AugOptions
from latentaugment_tpu.augments import create_augment
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.utils import util_io, util_path

truncation_psi = [1.0]
n_imgs = int(os.environ.get('LATENTAUGMENT_N_IMGS', 10000))


def main():
    for psi_value in truncation_psi:
        params = {
            'n_imgs': n_imgs,
            'p_thres': 0.0,
            'truncation_psi': psi_value,
        }
        print('Parameters.')
        print(params)

        opt = AugOptions().parse(args=params)

        outdir = os.path.join(opt.checkpoints_dir, opt.name)
        for outname in ['img', 'latent', 'img_aug', 'latent_aug']:
            util_path.create_dir(os.path.join(outdir, outname))

        dataset = create_dataset(opt)
        print('The number of training images = %d' % len(dataset))

        augment = create_augment(opt)

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
            data_w_aug = augment.get_latent_output()

            util_io.write_pickle(data, os.path.join(outdir, 'img', f'img_{i}'))
            util_io.write_pickle(data_aug, os.path.join(outdir, 'img_aug', f'img_aug_{i}'))
            util_io.write_pickle(data_w_aug, os.path.join(outdir, 'latent_aug', f'w_aug_{i}'))

        stats_time = augment.stats_time[1:]
        print(np.mean(stats_time))

    print('May the force be with you.')


if __name__ == '__main__':
    main()

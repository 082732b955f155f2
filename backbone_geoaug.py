"""Geometric augmentation sweep driver (parity: reference backbone_geoaug.py).

Runs flip/affine/elastic augmentation over the dataset, dumping
augmented batches and reporting the mean per-batch wall-time.
Run with --aug geometric on the CLI.
"""

import os

import numpy as np

from latentaugment_tpu.options import AugOptions
from latentaugment_tpu.augments import create_augment
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.utils import util_io, util_path

n_imgs = int(os.environ.get('LATENTAUGMENT_N_IMGS', 1000))


def main():
    for _ in range(1):
        params = {
            'n_imgs': n_imgs,
            'p_thres': 0.0,
            'horizontal_flip': True,
            'affine': True,
            'elastic_deform': True,
        }
        print('Parameters.')
        print(params)

        opt = AugOptions().parse(args=params)

        outdir = os.path.join(opt.checkpoints_dir, opt.name)
        for outname in ['img', 'img_aug']:
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

            util_io.write_pickle(data, os.path.join(outdir, 'img', f'img_{i}'))
            util_io.write_pickle(data_aug, os.path.join(outdir, 'img_aug', f'img_aug_{i}'))

        stats_time = augment.stats_time[1:]
        print(np.mean(stats_time))

    print('May the force be with you.')


if __name__ == '__main__':
    main()

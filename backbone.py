"""Template driver loop (parity: reference backbone.py).

Shows the minimal public-API usage: parse options, build dataset and
augment, run set_input / forward / get_output per batch.
"""

from latentaugment_tpu.options import AugOptions
from latentaugment_tpu.data import create_dataset
from latentaugment_tpu.augments import create_augment


def main():
    opt = AugOptions().parse()

    dataset = create_dataset(opt)
    print('The number of training images = %d' % len(dataset))

    augment = create_augment(opt)

    for i, data in enumerate(dataset):
        augment.set_input(data)
        augment.forward()
        data_aug = augment.get_output()
        del data_aug


if __name__ == '__main__':
    main()

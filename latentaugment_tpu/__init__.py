"""LatentAugment-TPU: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
LatentAugment GAN-based data-augmentation framework.

Capability parity target: ltronchin/LatentAugment (see /root/reference).
Public API contract (reference README.md:66-86):

    from latentaugment_tpu.options import AugOptions
    from latentaugment_tpu.data import create_dataset
    from latentaugment_tpu.augments import create_augment

    opt = AugOptions().parse()
    dataset = create_dataset(opt)
    augment = create_augment(opt)
    for data in dataset:
        augment.set_input(data)
        augment.forward()
        out = augment.get_output()

The compute path is pure JAX (jit/pjit + Pallas kernels); batch work is
sharded over a `jax.sharding.Mesh` instead of torch DataParallel.
"""

__version__ = "0.1.0"

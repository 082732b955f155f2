"""Augment package: plugin registry + factory.

Parity: reference augments/__init__.py:28-72 — dynamic import of
`augments/<name>_aug.py`, class-name match `<Name>Augment`
(case-insensitive, underscores stripped), option-setter plumbing.
"""

import importlib

from .base_aug import BaseAugment


def find_augment_using_name(augment_name):
    augment_filename = __name__ + "." + augment_name + "_aug"
    augmentlib = importlib.import_module(augment_filename)
    augment = None
    target = augment_name.replace("_", "") + "augment"
    for name, cls in augmentlib.__dict__.items():
        if name.lower() == target.lower() and isinstance(cls, type) \
                and issubclass(cls, BaseAugment):
            augment = cls
    if augment is None:
        raise NotImplementedError(
            "In %s.py, there should be a subclass of BaseAugment with class "
            "name that matches %s in lowercase." % (augment_filename, target))
    return augment


def get_option_setter(augment_name):
    return find_augment_using_name(augment_name).modify_commandline_options


def create_augment(opt):
    """Create an augment pipeline given the option (main package interface)."""
    augment = find_augment_using_name(opt.aug)
    instance = augment(opt)
    print("Augment [%s] was created" % type(instance).__name__)
    return instance

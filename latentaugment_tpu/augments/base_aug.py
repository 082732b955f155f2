"""Abstract augment base class.

Parity: reference augments/base_aug.py:7-64 — the
set_input/forward/get_output contract plus the optional
get_train_transform/sanity_check hooks. Device selection collapses to
JAX's: `gpu_ids` is retained only as an option field.
"""

import os
from abc import ABC, abstractmethod


class BaseAugment(ABC):
    """Subclasses implement __init__, set_input, forward (and usually
    get_output, modify_commandline_options)."""

    def __init__(self, opt):
        self.opt = opt
        self.gpu_ids = opt.gpu_ids
        self.save_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.save_dir, exist_ok=True)

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    @abstractmethod
    def set_input(self, data):
        """Unpack input data from the dataloader and pre-process."""

    @abstractmethod
    def forward(self):
        pass

    def get_train_transform(self):
        pass

    def get_valid_transform(self):
        pass

    def sanity_check(self):
        pass

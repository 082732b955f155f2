"""Paired MR/CT pelvis dataset from a zip of per-slice pickle dicts.

Parity: reference data/pelvis_dataset.py — each zip member
`<split>/<patient>/<slice>.pickle` holds a dict keyed by modality name
with HxW arrays in [0, 255]; loading composes a multi-channel float32
image, then normalizes each selected modality to [-1, 1]
((x - 127.5) / 127.5, the albumentations Normalize at
pelvis_dataset.py:12-26) and emits CHW tensors.
"""

import os
import pickle
import zipfile

import numpy as np

from ..utils import util_general
from .base_dataset import BaseDataset


def normalize_m11(x):
    """[0,255] -> [-1,1] float32, matching Normalize(mean=127.5, std=127.5)."""
    return (np.asarray(x, dtype=np.float32) - 127.5) / 127.5


class PelvisDataset(BaseDataset):
    """A dataset class for paired medical images (MR_nonrigid_CT / MR_MR_T2)."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument('--modalities', help="Dataset modalities", metavar="STRING",
                            type=str, default="MR_nonrigid_CT,MR_MR_T2")
        return parser

    def __init__(self, opt):
        BaseDataset.__init__(self, opt)
        self.opt = opt
        self._path = opt.dataroot

        self._modalities = util_general.parse_comma_separated_list(opt.modalities)
        assert len(self._modalities) > 0
        self._mode_to_idx = {mode: i for i, mode in enumerate(self._modalities)}

        self._zipfile = None
        if self._file_ext(self._path) == ".zip":
            self._type = "zip"
            self._all_fnames = set(self._get_zipfile().namelist())
        else:
            raise IOError("Path must point to a zip")

        # Select by the LEADING split component. The reference's
        # substring test (`opt.phase in fname`, pelvis_dataset.py:74)
        # selects identically on its zip layout (<split>/<patient>/...)
        # but cross-contaminates splits when a patient name contains a
        # phase word (round-3 review); the component match is exact.
        self.AB_paths = sorted(
            fname for fname in self._all_fnames
            if self._file_ext(fname) == ".pickle"
            and fname.replace("\\", "/").split("/")[0] == opt.phase)
        if len(self.AB_paths) == 0:
            raise IOError("No image files found in the specified path")

    def __getitem__(self, index):
        """Return {'A','B','A_paths','B_paths'}: CHW float32 images in [-1,1]."""
        A, B, AB_path = self._load_img(index)
        A = normalize_m11(A)[None, :, :]
        B = normalize_m11(B)[None, :, :]
        return {'A': A, 'B': B, 'A_paths': AB_path, 'B_paths': AB_path}

    def __len__(self):
        return len(self.AB_paths)

    @staticmethod
    def _file_ext(fname):
        return os.path.splitext(fname)[1].lower()

    def _get_zipfile(self):
        assert self._type == "zip"
        if self._zipfile is None:
            self._zipfile = zipfile.ZipFile(self._path)
        return self._zipfile

    def _open_file(self, fname):
        if self._type == "zip":
            return self._get_zipfile().open(fname, "r")
        raise IOError("Support only zip.")

    def _create_AB(self, p):
        s = p[self._modalities[0]]
        out_image = np.zeros((len(self._modalities), s.shape[0], s.shape[1]), dtype=np.float32)
        for i, modality in enumerate(self._modalities):
            out_image[i, :, :] = np.asarray(p[modality], dtype=np.float32)
        return out_image

    def _load_img(self, index):
        AB_path = self.AB_paths[index]
        with self._open_file(AB_path) as f:
            AB_dict = pickle.load(f)
        AB = self._create_AB(AB_dict)

        assert AB.dtype == np.dtype('float32')
        assert AB.shape == (len(self._modalities), self.opt.load_size, self.opt.load_size)

        A = AB[self._mode_to_idx['MR_nonrigid_CT'], :, :]
        B = AB[self._mode_to_idx['MR_MR_T2'], :, :]
        return A, B, AB_path

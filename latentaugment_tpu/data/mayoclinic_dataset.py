"""Mayo Clinic low-dose/high-dose CT dataset.

Parity: reference data/mayoclinic_dataset.py — CSV annotations with
'domain' (LD/HD) and 'path_slice' columns; per-slice pipeline: DICOM
read -> HU conversion (slope/intercept) -> clip [lower, upper] ->
normalize to [-1, 1] -> resize to img_shape.

Environment gating: pydicom/cv2 are not in this image; DICOM reads
require pydicom (clear error otherwise), while `.npy` slice files
(assumed already in HU) are supported natively, and resizing uses PIL
bilinear (cv2.resize's default interpolation).
"""

import numpy as np
from PIL import Image

from ..utils import util_general, util_path
from .base_dataset import BaseDataset

try:
    import pydicom
except ImportError:
    pydicom = None


def convert_hu_img(dicom_file):
    img = dicom_file.pixel_array
    intercept = dicom_file.RescaleIntercept
    slope = dicom_file.RescaleSlope
    return slope * img + intercept


def clip_img(hu_img, lower, upper):
    return np.clip(hu_img, lower, upper)


def normalize_img(x, lower, upper, data_range='-11'):
    if lower is None:
        lower = np.min(x)
    if upper is None:
        upper = np.max(x)
    x_norm = (x - lower) / (upper - lower)
    if data_range == '01':
        return x_norm
    return (2 * x_norm) - 1


def resize_img(x, shape):
    """Bilinear resize of an HW float array (cv2.resize default semantics)."""
    return np.asarray(
        Image.fromarray(np.asarray(x, dtype=np.float32), mode="F")
        .resize((shape, shape), Image.BILINEAR))


class MayoClinicDataset(BaseDataset):
    @staticmethod
    def modify_commandline_options(parser, is_train):
        parser.add_argument('--modalities', help="Dataset modalities", metavar="STRING", type=str, default="HD,LD")
        parser.add_argument('--lower', help="Lower value for hu clip.", type=int, default=-1000)
        parser.add_argument('--upper', help="Upper value for hu clip.", type=int, default=2000)
        parser.add_argument('--img_shape', help="Image shape for resize.", type=int, default=256)
        from ..options.base_options import str2bool
        parser.add_argument('--plot_verbose', help="Plot images.", type=str2bool, default=False)
        parser.add_argument('--model_name', help="Model to use for training.", default='pix2pix')
        return parser

    def __init__(self, opt):
        BaseDataset.__init__(self, opt)
        import pandas as pd

        self.opt = opt
        self._path = opt.dataroot
        self.lower = opt.lower
        self.upper = opt.upper
        self.img_shape = opt.img_shape
        self.model_name = opt.model_name

        df = pd.read_csv(self._path, index_col=0)
        self.df_ld = df.loc[df['domain'] == 'LD'].reset_index(drop=True)
        self.df_hd = df.loc[df['domain'] == 'HD'].reset_index(drop=True)
        if len(self.df_ld) == 0 or len(self.df_hd) == 0:
            raise IOError("No image files found in the specified path.")
        if len(self.df_ld) != len(self.df_hd):
            raise IOError("Uncoupled dataset.")
        self.len_lw = len(self.df_ld)

        self._modalities = util_general.parse_comma_separated_list(opt.modalities)
        assert len(self._modalities) > 0

    def __getitem__(self, index):
        A_paths = self.df_hd['path_slice'].iloc[index]  # High Dose
        B_paths = self.df_ld['path_slice'].iloc[index]  # Low Dose
        if A_paths.endswith('.npy') and B_paths.endswith('.npy'):
            pass  # npy slices have no per-file id convention to assert
        else:
            A_id = util_path.get_filename(A_paths).split('.')[3]
            B_id = util_path.get_filename(B_paths).split('.')[3]
            assert A_id == B_id

        A = self._load_hu(A_paths)
        B = self._load_hu(B_paths)
        A = self.transforms(A)
        B = self.transforms(B)

        if self.model_name == 'pix2pix':
            return {'A': A, 'B': B, 'A_paths': A_paths, 'B_paths': B_paths}
        raise NotImplementedError(self.model_name)

    def __len__(self):
        return self.len_lw

    def _load_hu(self, path):
        """Load a slice in HU units from DICOM (pydicom) or .npy."""
        if path.endswith('.npy'):
            return np.load(path)
        if pydicom is None:
            raise ImportError(
                "pydicom is required to read DICOM slices and is not "
                "installed in this environment; convert slices to .npy (HU "
                "units) or install pydicom.")
        return convert_hu_img(pydicom.dcmread(path))

    def transforms(self, hu_img):
        x = clip_img(hu_img, self.lower, self.upper)
        x = normalize_img(x, self.lower, self.upper)
        x = resize_img(x, self.img_shape)
        return np.asarray(x, dtype=np.float32)[None, :, :]

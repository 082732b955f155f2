"""Frechet Inception Distance.

Parity: reference metrics/frechet_inception_distance.py:20-45 — mean/cov
of real features (dataset), of generated features (dumped augmented
batches or live generator), Frechet formula with a matrix square root.
Feature extraction is jitted on device; the 2048x2048 sqrtm runs on the
host (scipy), as in the reference.
"""

import numpy as np
import scipy.linalg

from . import metric_utils

DETECTOR_URL = ('https://api.ngc.nvidia.com/v2/models/nvidia/research/'
                'stylegan3/versions/1/files/metrics/inception-2015-12-05.pkl')


def fid_from_moments(mu_real, sigma_real, mu_gen, sigma_gen):
    m = np.square(mu_gen - mu_real).sum()
    s, _ = scipy.linalg.sqrtm(np.dot(sigma_gen, sigma_real), disp=False)
    return float(np.real(m + np.trace(sigma_gen + sigma_real - s * 2)))


def compute_fid(opts, max_real, num_gen):
    detector_kwargs = dict(return_features=True)
    mu_real, sigma_real = metric_utils.compute_feature_stats_for_dataset(
        opts=opts, detector_url=DETECTOR_URL, detector_kwargs=detector_kwargs,
        mode_dict=opts.mode_dict, rel_lo=0, rel_hi=0, capture_mean_cov=True,
        max_items=max_real).get_mean_cov()

    if opts.dataset_kwargs_gen:
        mu_gen, sigma_gen = metric_utils.compute_feature_stats_for_aug_dataset(
            opts=opts, detector_url=DETECTOR_URL, detector_kwargs=detector_kwargs,
            mode_dict=opts.mode_dict, rel_lo=0, rel_hi=1, capture_mean_cov=True,
            max_items=num_gen).get_mean_cov()
    else:
        mu_gen, sigma_gen = metric_utils.compute_feature_stats_for_generator(
            opts=opts, detector_url=DETECTOR_URL, detector_kwargs=detector_kwargs,
            mode_dict=opts.mode_dict, rel_lo=0, rel_hi=1, capture_mean_cov=True,
            max_items=num_gen).get_mean_cov()

    return fid_from_moments(mu_real, sigma_real, mu_gen, sigma_gen)

"""Alias-free (StyleGAN3) generator family, TPU-native.

The reference vendors StyleGAN3's torch_utils as its runtime (SURVEY.md
§2.2) and loads architectures from pickle-embedded source, so its users
can run alias-free checkpoints; this package provides the family
natively for JAX (networks.py), the Kaiser filter designer (filters.py)
and checkpoint ingestion (convert.py). The SG2 walk engine dispatches
here when a loaded generator's cfg.arch == 'stylegan3'.
"""

from . import convert, filters, networks  # noqa: F401

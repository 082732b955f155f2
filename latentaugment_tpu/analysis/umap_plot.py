"""Plotting front-end for the UMAP coverage analysis.

Parity: reference analysis/umap_plot.py — the plotting half of the
manifold-coverage pipeline. The embedding + projection logic lives in
umap_analysis; this module re-exports the plot helpers so both reference
entry points exist.
"""

from ..utils.util_reports import (  # noqa: F401
    image_grid, scatter_plot, scatter_plot_interactive,
)
from .umap_analysis import load_latents_from_dir, manifold_coverage  # noqa: F401

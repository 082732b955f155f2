"""Report/plot helpers (parity: reference utils/util_reports.py).

Static matplotlib scatter + image-grid helpers, and the interactive
Bokeh scatter (gated — bokeh is optional in this image).
"""

import os

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def scatter_plot(points, labels=None, title="", save_path=None, cmap="tab10",
                 alpha=0.6, s=8):
    """2-D scatter of [N, 2] points, colored by integer labels."""
    plt = _plt()
    points = np.asarray(points)
    fig, ax = plt.subplots(figsize=(6, 6))
    if labels is None:
        ax.scatter(points[:, 0], points[:, 1], s=s, alpha=alpha)
    else:
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            m = labels == lab
            ax.scatter(points[m, 0], points[m, 1], s=s, alpha=alpha,
                       label=str(lab))
        ax.legend()
    ax.set_title(title)
    if save_path:
        fig.savefig(save_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return save_path


def scatter_plot_interactive(points, labels, title="", save_path=None,
                             hover_images=None):
    """Interactive Bokeh scatter (parity: util_reports.py:119). Falls back
    to the static plot when bokeh is unavailable."""
    try:
        from bokeh.models import ColumnDataSource, HoverTool
        from bokeh.plotting import figure, output_file, save
    except ImportError:
        print("[reports] bokeh not installed; writing static scatter instead")
        alt = (os.path.splitext(save_path)[0] + ".png") if save_path else None
        return scatter_plot(points, labels, title=title, save_path=alt)

    points = np.asarray(points)
    source = ColumnDataSource(data=dict(
        x=points[:, 0], y=points[:, 1],
        label=[str(l) for l in labels],
        img=hover_images if hover_images is not None else [""] * len(points)))
    p = figure(title=title, tools="pan,wheel_zoom,box_zoom,reset,save")
    p.scatter("x", "y", source=source, legend_field="label", alpha=0.6, size=5)
    p.add_tools(HoverTool(tooltips=[("label", "@label")]))
    if save_path:
        output_file(save_path)
        save(p)
    return save_path


def image_grid(images, n_cols=8, save_path=None, title=""):
    """Tile a batch of [N, 1, H, W] or [N, H, W] images into one PNG."""
    plt = _plt()
    images = np.asarray(images)
    if images.ndim == 4:
        images = images[:, 0]
    n = images.shape[0]
    n_rows = (n + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols,
                             figsize=(1.5 * n_cols, 1.5 * n_rows))
    axes = np.atleast_2d(axes)
    for i in range(n_rows * n_cols):
        ax = axes[i // n_cols, i % n_cols]
        ax.axis("off")
        if i < n:
            ax.imshow(images[i], cmap="gray")
    fig.suptitle(title)
    if save_path:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return save_path

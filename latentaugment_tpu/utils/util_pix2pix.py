"""pix2pix-style image helpers (parity: reference utils/util_pix2pix.py).

tensor2im / save_image / diagnostics used by downstream image-to-image
training loops consuming the augmented batches.
"""

import os

import numpy as np
from PIL import Image


def tensor2im(input_image, imtype=np.uint8):
    """[-1,1] CHW (or NCHW, first item) array -> HWC uint8 image."""
    img = np.asarray(input_image)
    if img.ndim == 4:
        img = img[0]
    if img.ndim == 3:
        img = np.transpose(img, (1, 2, 0))
    img = (img + 1) / 2.0 * 255.0
    img = np.clip(img, 0, 255)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    return img.astype(imtype)


def save_image(image_numpy, image_path, aspect_ratio=1.0):
    """Save an HWC uint8 array to disk (optional aspect-ratio resize)."""
    pil = Image.fromarray(image_numpy)
    h, w = image_numpy.shape[:2]
    if aspect_ratio > 1.0:
        pil = pil.resize((int(w * aspect_ratio), h), Image.BICUBIC)
    elif aspect_ratio < 1.0:
        pil = pil.resize((w, int(h / aspect_ratio)), Image.BICUBIC)
    pil.save(image_path)


def diagnose_network(tree, name="network"):
    """Mean absolute value of leaves (parity: diagnose_network on grads)."""
    vals = []

    def visit(node):
        if isinstance(node, dict):
            for v in node.values():
                visit(v)
        else:
            vals.append(float(np.mean(np.abs(np.asarray(node)))))

    visit(tree)
    mean = float(np.mean(vals)) if vals else 0.0
    print(f"{name}: mean |leaf| = {mean}")
    return mean


def print_numpy(x, val=True, shp=False):
    x = np.asarray(x).astype(np.float64)
    if shp:
        print("shape,", x.shape)
    if val:
        x = x.flatten()
        print("mean = %3.3f, min = %3.3f, max = %3.3f, median = %3.3f, "
              "std=%3.3f" % (np.mean(x), np.min(x), np.max(x),
                             np.median(x), np.std(x)))


def mkdir(path):
    """Create a directory if absent (parity: ref util_pix2pix.py:96-103)."""
    os.makedirs(path, exist_ok=True)


def mkdirs(paths):
    """Create each directory in a list (parity: ref util_pix2pix.py:83-91)."""
    if isinstance(paths, list) and not isinstance(paths, str):
        for p in paths:
            mkdir(p)
    else:
        mkdir(paths)

"""InceptionV3 feature detector for FID, functional JAX.

Replaces the NVIDIA TorchScript `inception-2015-12-05.pkl` detector the
reference downloads by URL (metrics/frechet_inception_distance.py:22).
Architecture follows the torchvision InceptionV3 graph (BasicConv2d =
conv + batchnorm(eps=1e-3) + relu), producing the standard 2048-d
pre-softmax pooled features. `convert_torchvision_state` maps a cached
torchvision `inception_v3` state_dict onto the param tree; without
weights a seeded He init provides a self-consistent fallback detector
(FID values remain comparable across runs of this framework).

Inputs are [N, 3, H, W] in [0, 255]; they are bilinearly resized to
299x299 and scaled to [-1, 1] (the TF FID convention).
"""

import pickle
import zlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# ----------------------------------------------------------------------------
# Primitives

def _he_conv(key, c_out, c_in, kh, kw):
    fan_in = c_in * kh * kw
    return jax.random.normal(key, (c_out, c_in, kh, kw), jnp.float32) \
        * np.sqrt(2.0 / fan_in)


def _basic_conv_init(key, c_in, c_out, kh, kw):
    return {
        "conv": {"weight": _he_conv(key, c_out, c_in, kh, kw)},
        "bn": {"weight": jnp.ones((c_out,), jnp.float32),
               "bias": jnp.zeros((c_out,), jnp.float32),
               "running_mean": jnp.zeros((c_out,), jnp.float32),
               "running_var": jnp.ones((c_out,), jnp.float32)},
    }


def _basic_conv(p, x, stride=1, padding=(0, 0)):
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["conv"]["weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, (stride, stride),
        ((padding[0], padding[0]), (padding[1], padding[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    bn = p["bn"]
    inv = lax.rsqrt(bn["running_var"].astype(x.dtype) + 1e-3)
    x = (x - bn["running_mean"].astype(x.dtype)[None, :, None, None]) \
        * (inv * bn["weight"].astype(x.dtype))[None, :, None, None] \
        + bn["bias"].astype(x.dtype)[None, :, None, None]
    return jax.nn.relu(x)


def _basic_conv_rect(p, x, pad_hw):
    """BasicConv2d with asymmetric (h, w) padding for 1x7/7x1 kernels."""
    w = p["conv"]["weight"].astype(x.dtype)
    x = lax.conv_general_dilated(
        x, w, (1, 1), ((pad_hw[0], pad_hw[0]), (pad_hw[1], pad_hw[1])),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    bn = p["bn"]
    inv = lax.rsqrt(bn["running_var"].astype(x.dtype) + 1e-3)
    x = (x - bn["running_mean"].astype(x.dtype)[None, :, None, None]) \
        * (inv * bn["weight"].astype(x.dtype))[None, :, None, None] \
        + bn["bias"].astype(x.dtype)[None, :, None, None]
    return jax.nn.relu(x)


def _maxpool(x, k=3, s=2, p=0):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, k, k), (1, 1, s, s),
                             [(0, 0), (0, 0), (p, p), (p, p)])


def _avgpool(x, k=3, s=1, p=1):
    summed = lax.reduce_window(x, 0.0, lax.add, (1, 1, k, k), (1, 1, s, s),
                               [(0, 0), (0, 0), (p, p), (p, p)])
    ones = jnp.ones_like(x[:1, :1])
    counts = lax.reduce_window(ones, 0.0, lax.add, (1, 1, k, k), (1, 1, s, s),
                               [(0, 0), (0, 0), (p, p), (p, p)])
    return summed / counts


# ----------------------------------------------------------------------------
# Blocks (init + apply); names match torchvision state-dict keys.

def _fold(key, *tags):
    # zlib.crc32, NOT hash(): str hash is salted per interpreter process,
    # which would give the seeded fallback detector different weights in
    # every run — silently corrupting FID/PR against the persisted
    # feature-stats cache (round-3 review).
    for t in tags:
        key = jax.random.fold_in(key, zlib.crc32(t.encode()) % (2 ** 31))
    return key


def _inception_a_init(key, c_in, pool_features):
    return {
        "branch1x1": _basic_conv_init(_fold(key, "b1"), c_in, 64, 1, 1),
        "branch5x5_1": _basic_conv_init(_fold(key, "b51"), c_in, 48, 1, 1),
        "branch5x5_2": _basic_conv_init(_fold(key, "b52"), 48, 64, 5, 5),
        "branch3x3dbl_1": _basic_conv_init(_fold(key, "b31"), c_in, 64, 1, 1),
        "branch3x3dbl_2": _basic_conv_init(_fold(key, "b32"), 64, 96, 3, 3),
        "branch3x3dbl_3": _basic_conv_init(_fold(key, "b33"), 96, 96, 3, 3),
        "branch_pool": _basic_conv_init(_fold(key, "bp"), c_in, pool_features, 1, 1),
    }


def _inception_a(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_2"], _basic_conv(p["branch5x5_1"], x), padding=2)
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _basic_conv(p["branch3x3dbl_3"], b3, padding=1)
    bp = _basic_conv(p["branch_pool"], _avgpool(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=1)


def _inception_b_init(key, c_in):
    return {
        "branch3x3": _basic_conv_init(_fold(key, "b3"), c_in, 384, 3, 3),
        "branch3x3dbl_1": _basic_conv_init(_fold(key, "b31"), c_in, 64, 1, 1),
        "branch3x3dbl_2": _basic_conv_init(_fold(key, "b32"), 64, 96, 3, 3),
        "branch3x3dbl_3": _basic_conv_init(_fold(key, "b33"), 96, 96, 3, 3),
    }


def _inception_b(p, x):
    b3 = _basic_conv(p["branch3x3"], x, stride=2)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=1)
    bd = _basic_conv(p["branch3x3dbl_3"], bd, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=1)


def _inception_c_init(key, c_in, c7):
    return {
        "branch1x1": _basic_conv_init(_fold(key, "b1"), c_in, 192, 1, 1),
        "branch7x7_1": _basic_conv_init(_fold(key, "b71"), c_in, c7, 1, 1),
        "branch7x7_2": _basic_conv_init(_fold(key, "b72"), c7, c7, 1, 7),
        "branch7x7_3": _basic_conv_init(_fold(key, "b73"), c7, 192, 7, 1),
        "branch7x7dbl_1": _basic_conv_init(_fold(key, "bd1"), c_in, c7, 1, 1),
        "branch7x7dbl_2": _basic_conv_init(_fold(key, "bd2"), c7, c7, 7, 1),
        "branch7x7dbl_3": _basic_conv_init(_fold(key, "bd3"), c7, c7, 1, 7),
        "branch7x7dbl_4": _basic_conv_init(_fold(key, "bd4"), c7, c7, 7, 1),
        "branch7x7dbl_5": _basic_conv_init(_fold(key, "bd5"), c7, 192, 1, 7),
        "branch_pool": _basic_conv_init(_fold(key, "bp"), c_in, 192, 1, 1),
    }


def _inception_c(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv_rect(p["branch7x7_2"], b7, (0, 3))
    b7 = _basic_conv_rect(p["branch7x7_3"], b7, (3, 0))
    bd = _basic_conv(p["branch7x7dbl_1"], x)
    bd = _basic_conv_rect(p["branch7x7dbl_2"], bd, (3, 0))
    bd = _basic_conv_rect(p["branch7x7dbl_3"], bd, (0, 3))
    bd = _basic_conv_rect(p["branch7x7dbl_4"], bd, (3, 0))
    bd = _basic_conv_rect(p["branch7x7dbl_5"], bd, (0, 3))
    bp = _basic_conv(p["branch_pool"], _avgpool(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=1)


def _inception_d_init(key, c_in):
    return {
        "branch3x3_1": _basic_conv_init(_fold(key, "b31"), c_in, 192, 1, 1),
        "branch3x3_2": _basic_conv_init(_fold(key, "b32"), 192, 320, 3, 3),
        "branch7x7x3_1": _basic_conv_init(_fold(key, "b71"), c_in, 192, 1, 1),
        "branch7x7x3_2": _basic_conv_init(_fold(key, "b72"), 192, 192, 1, 7),
        "branch7x7x3_3": _basic_conv_init(_fold(key, "b73"), 192, 192, 7, 1),
        "branch7x7x3_4": _basic_conv_init(_fold(key, "b74"), 192, 192, 3, 3),
    }


def _inception_d(p, x):
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = _basic_conv(p["branch3x3_2"], b3, stride=2)
    b7 = _basic_conv(p["branch7x7x3_1"], x)
    b7 = _basic_conv_rect(p["branch7x7x3_2"], b7, (0, 3))
    b7 = _basic_conv_rect(p["branch7x7x3_3"], b7, (3, 0))
    b7 = _basic_conv(p["branch7x7x3_4"], b7, stride=2)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=1)


def _inception_e_init(key, c_in):
    return {
        "branch1x1": _basic_conv_init(_fold(key, "b1"), c_in, 320, 1, 1),
        "branch3x3_1": _basic_conv_init(_fold(key, "b31"), c_in, 384, 1, 1),
        "branch3x3_2a": _basic_conv_init(_fold(key, "b32a"), 384, 384, 1, 3),
        "branch3x3_2b": _basic_conv_init(_fold(key, "b32b"), 384, 384, 3, 1),
        "branch3x3dbl_1": _basic_conv_init(_fold(key, "bd1"), c_in, 448, 1, 1),
        "branch3x3dbl_2": _basic_conv_init(_fold(key, "bd2"), 448, 384, 3, 3),
        "branch3x3dbl_3a": _basic_conv_init(_fold(key, "bd3a"), 384, 384, 1, 3),
        "branch3x3dbl_3b": _basic_conv_init(_fold(key, "bd3b"), 384, 384, 3, 1),
        "branch_pool": _basic_conv_init(_fold(key, "bp"), c_in, 192, 1, 1),
    }


def _inception_e(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _basic_conv_rect(p["branch3x3_2a"], b3, (0, 1)),
        _basic_conv_rect(p["branch3x3_2b"], b3, (1, 0)),
    ], axis=1)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _basic_conv_rect(p["branch3x3dbl_3a"], bd, (0, 1)),
        _basic_conv_rect(p["branch3x3dbl_3b"], bd, (1, 0)),
    ], axis=1)
    bp = _basic_conv(p["branch_pool"], _avgpool(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=1)


# ----------------------------------------------------------------------------
# Full network

def init_inception(key=None, seed=0):
    key = key if key is not None else jax.random.PRNGKey(seed)
    p = {
        "Conv2d_1a_3x3": _basic_conv_init(_fold(key, "1a"), 3, 32, 3, 3),
        "Conv2d_2a_3x3": _basic_conv_init(_fold(key, "2a"), 32, 32, 3, 3),
        "Conv2d_2b_3x3": _basic_conv_init(_fold(key, "2b"), 32, 64, 3, 3),
        "Conv2d_3b_1x1": _basic_conv_init(_fold(key, "3b"), 64, 80, 1, 1),
        "Conv2d_4a_3x3": _basic_conv_init(_fold(key, "4a"), 80, 192, 3, 3),
        "Mixed_5b": _inception_a_init(_fold(key, "5b"), 192, 32),
        "Mixed_5c": _inception_a_init(_fold(key, "5c"), 256, 64),
        "Mixed_5d": _inception_a_init(_fold(key, "5d"), 288, 64),
        "Mixed_6a": _inception_b_init(_fold(key, "6a"), 288),
        "Mixed_6b": _inception_c_init(_fold(key, "6b"), 768, 128),
        "Mixed_6c": _inception_c_init(_fold(key, "6c"), 768, 160),
        "Mixed_6d": _inception_c_init(_fold(key, "6d"), 768, 160),
        "Mixed_6e": _inception_c_init(_fold(key, "6e"), 768, 192),
        "Mixed_7a": _inception_d_init(_fold(key, "7a"), 768),
        "Mixed_7b": _inception_e_init(_fold(key, "7b"), 1280),
        "Mixed_7c": _inception_e_init(_fold(key, "7c"), 2048),
    }
    return p


def _resize_bilinear(x, size):
    return jax.image.resize(x, (x.shape[0], x.shape[1], size, size), "bilinear")


def inception_features(params, x):
    """[N, 3, H, W] in [0, 255] -> 2048-d pooled FID features [N, 2048]."""
    x = _resize_bilinear(x.astype(jnp.float32), 299)
    x = x / 127.5 - 1.0
    x = _basic_conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _basic_conv(params["Conv2d_2a_3x3"], x)
    x = _basic_conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool(x)
    x = _basic_conv(params["Conv2d_3b_1x1"], x)
    x = _basic_conv(params["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    return jnp.mean(x, axis=(2, 3))  # global average pool -> [N, 2048]


# ----------------------------------------------------------------------------
# Weight IO

def convert_torchvision_state(state_dict, out_path=None, strict=False):
    """Map a torchvision inception_v3 state_dict onto our param tree.

    strict=True raises if any state key (other than the classifier heads
    we deliberately drop) fails to land on a tree leaf, or if a shape
    mismatches — so a renamed block or a transposed weight cannot slip
    through silently.
    """
    tree = init_inception(jax.random.PRNGKey(0))

    def set_leaf(name, path, arr):
        node = tree
        for k in path[:-1]:
            if not isinstance(node, dict) or k not in node:
                if strict:
                    raise KeyError(f"torchvision key {name!r} has no slot in "
                                   f"the param tree (missing {k!r})")
                return
            node = node[k]
        leaf = path[-1]
        if leaf not in node:
            if strict:
                raise KeyError(f"torchvision key {name!r}: no leaf {leaf!r}")
            return
        arr = np.asarray(arr, np.float32)
        if tuple(node[leaf].shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch for {name!r}: tree {tuple(node[leaf].shape)} "
                f"vs state {tuple(arr.shape)}")
        node[leaf] = jnp.asarray(arr)

    for name, tensor in state_dict.items():
        parts = name.split(".")
        if parts[0] in ("AuxLogits", "fc"):
            continue
        if parts[-1] == "num_batches_tracked":
            continue  # bn bookkeeping scalar, unused in inference
        # torchvision: <Block>.<branch>.conv.weight / .bn.{weight,bias,running_*}
        arr = tensor.detach().numpy() if hasattr(tensor, "detach") else tensor
        if len(parts) in (3, 4):
            set_leaf(name, tuple(parts), arr)
        elif strict:
            raise KeyError(f"unrecognized torchvision key {name!r}")
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(jax.tree_util.tree_map(lambda a: np.asarray(a), tree), f,
                        pickle.HIGHEST_PROTOCOL)
    return tree


def get_inception(path=None, seed=0):
    if path is not None:
        try:
            # Restricted unpickler: the URL cache this reads from is also
            # where a raw NVIDIA inception-2015-12-05.pkl would land —
            # stock pickle.load would execute its embedded source
            # (round-3 review). Validate the converted-tree structure so
            # a payload-stub load falls back instead of crashing later.
            from .stylegan2.convert import load_network_pickle

            obj = load_network_pickle(path)
            if not isinstance(obj, dict) or "Conv2d_1a_3x3" not in obj:
                raise ValueError(
                    "not a converted inception param tree "
                    "(raw NVIDIA pickle instead of converted weights?)")
            leaves = jax.tree_util.tree_leaves(obj)
            if not leaves or not all(hasattr(a, "shape") for a in leaves):
                raise ValueError("param tree contains non-array leaves")
            return jax.tree_util.tree_map(jnp.asarray, obj)
        except (OSError, pickle.UnpicklingError, ValueError, KeyError) as e:
            print(f"[inception] could not load {path} ({e}); using seeded init")
    return init_inception(seed=seed)

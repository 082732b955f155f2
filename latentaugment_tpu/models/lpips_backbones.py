"""AlexNet / SqueezeNet-1.1 LPIPS feature backbones in functional JAX.

Parity: reference augments/criteria/lpips/networks.py:52-83 — the
torchvision `alexnet().features` / `squeezenet1_1().features` trunks with
the richzhang tap layers:

  AlexNet:    taps after relu1..relu5  (torchvision indices [2,5,8,10,12]),
              channels [64, 192, 384, 256, 256]
  SqueezeNet: taps at indices [2,5,8,10,11,12,13],
              channels [64, 128, 256, 384, 384, 512, 512]

Both consume the BaseNet z-scored input (networks.py:40-50): images in
[-1, 1] shifted by (-.030, -.088, -.188) and scaled by (.458, .448, .450)
— the same convention as models/vgg.py. Weights load from converted
torchvision state dicts (convert_torchvision_*) or fall back to a seeded
He init (self-consistent features; see vgg.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .vgg import _LPIPS_SHIFT, _LPIPS_SCALE

ALEX_TAPS = ["relu1", "relu2", "relu3", "relu4", "relu5"]
ALEX_CHANNELS = {"relu1": 64, "relu2": 192, "relu3": 384, "relu4": 256,
                 "relu5": 256}
SQUEEZE_TAPS = [f"relu{i}" for i in range(1, 8)]
SQUEEZE_CHANNELS = {"relu1": 64, "relu2": 128, "relu3": 256, "relu4": 384,
                    "relu5": 384, "relu6": 512, "relu7": 512}

# (name, out_ch, kernel, stride, padding) of torchvision alexnet().features.
_ALEX_CONVS = [
    ("conv1", 64, 11, 4, 2),
    ("conv2", 192, 5, 1, 2),
    ("conv3", 384, 3, 1, 1),
    ("conv4", 256, 3, 1, 1),
    ("conv5", 256, 3, 1, 1),
]

# squeezenet1_1 fire configs: (name, squeeze_ch, expand_ch each branch).
_SQUEEZE_FIRES = [
    ("fire2", 16, 64), ("fire3", 16, 64),
    ("fire4", 32, 128), ("fire5", 32, 128),
    ("fire6", 48, 192), ("fire7", 48, 192),
    ("fire8", 64, 256), ("fire9", 64, 256),
]


def _he_conv(key, c_out, c_in, k):
    fan_in = c_in * k * k
    return {
        "weight": jax.random.normal(key, (c_out, c_in, k, k), jnp.float32)
                  * np.sqrt(2.0 / fan_in),
        "bias": jnp.zeros((c_out,), jnp.float32),
    }


def _conv(x, p, stride=1, padding=0):
    out = lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["bias"].astype(x.dtype)[None, :, None, None]


def _maxpool(x, k=3, s=2, ceil_mode=False):
    """torch MaxPool2d(k, s) with optional ceil_mode (squeezenet1_1)."""
    h, w = x.shape[2], x.shape[3]
    if ceil_mode:
        pad_h = max(0, -(-(h - k) // s) * s + k - h)
        pad_w = max(0, -(-(w - k) // s) * s + k - w)
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)),
                        constant_values=-jnp.inf)
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, k, k),
                             (1, 1, s, s), "VALID")


def _z_score(x):
    """[-1,1] images -> BaseNet z-scored input."""
    return (x - jnp.asarray(_LPIPS_SHIFT, x.dtype)[None, :, None, None]) \
        / jnp.asarray(_LPIPS_SCALE, x.dtype)[None, :, None, None]


# ----------------------------------------------------------------------------
# AlexNet

def init_alexnet(key):
    params = {}
    c_in = 3
    for name, c_out, k, _, _ in _ALEX_CONVS:
        key, sub = jax.random.split(key)
        params[name] = _he_conv(sub, c_out, c_in, k)
        c_in = c_out
    return params


def alexnet_taps(params, x):
    """x in [-1,1] -> {relu1..relu5: activation} (trunk order:
    conv-relu-pool, conv-relu-pool, conv-relu, conv-relu, conv-relu)."""
    x = _z_score(x)
    out = {}
    x = jax.nn.relu(_conv(x, params["conv1"], stride=4, padding=2))
    out["relu1"] = x
    x = _maxpool(x)
    x = jax.nn.relu(_conv(x, params["conv2"], padding=2))
    out["relu2"] = x
    x = _maxpool(x)
    x = jax.nn.relu(_conv(x, params["conv3"], padding=1))
    out["relu3"] = x
    x = jax.nn.relu(_conv(x, params["conv4"], padding=1))
    out["relu4"] = x
    x = jax.nn.relu(_conv(x, params["conv5"], padding=1))
    out["relu5"] = x
    return out


def convert_torchvision_alexnet(state_dict):
    """torchvision alexnet state dict (features.{0,3,6,8,10}.*) -> tree."""
    idx = {0: "conv1", 3: "conv2", 6: "conv3", 8: "conv4", 10: "conv5"}
    params = init_alexnet(jax.random.PRNGKey(0))
    for name, arr in state_dict.items():
        parts = name.split(".")
        if parts[0] != "features":
            continue
        layer = idx.get(int(parts[1]))
        if layer is None:
            raise KeyError(f"unexpected alexnet key {name!r}")
        arr = np.asarray(arr.detach().numpy() if hasattr(arr, "detach")
                         else arr, np.float32)
        if tuple(params[layer][parts[2]].shape) != arr.shape:
            raise ValueError(f"shape mismatch for {name!r}")
        params[layer][parts[2]] = jnp.asarray(arr)
    return params


# ----------------------------------------------------------------------------
# SqueezeNet 1.1

def init_squeezenet(key):
    key, sub = jax.random.split(key)
    params = {"conv1": _he_conv(sub, 64, 3, 3)}
    c_in = 64
    for name, sq, ex in _SQUEEZE_FIRES:
        key, k1, k2, k3 = jax.random.split(key, 4)
        params[name] = {
            "squeeze": _he_conv(k1, sq, c_in, 1),
            "expand1x1": _he_conv(k2, ex, sq, 1),
            "expand3x3": _he_conv(k3, ex, sq, 3),
        }
        c_in = 2 * ex
    return params


def _fire(x, p):
    s = jax.nn.relu(_conv(x, p["squeeze"]))
    e1 = jax.nn.relu(_conv(s, p["expand1x1"]))
    e3 = jax.nn.relu(_conv(s, p["expand3x3"], padding=1))
    return jnp.concatenate([e1, e3], axis=1)


def squeezenet_taps(params, x):
    """x in [-1,1] -> {relu1..relu7} at torchvision indices
    [2,5,8,10,11,12,13] of squeezenet1_1().features."""
    x = _z_score(x)
    out = {}
    x = jax.nn.relu(_conv(x, params["conv1"], stride=2))      # idx 2
    out["relu1"] = x
    x = _maxpool(x, ceil_mode=True)                            # idx 3
    x = _fire(x, params["fire2"])                              # idx 4
    x = _fire(x, params["fire3"])                              # idx 5
    out["relu2"] = x
    x = _maxpool(x, ceil_mode=True)                            # idx 6
    x = _fire(x, params["fire4"])                              # idx 7
    x = _fire(x, params["fire5"])                              # idx 8
    out["relu3"] = x
    x = _maxpool(x, ceil_mode=True)                            # idx 9
    x = _fire(x, params["fire6"])                              # idx 10
    out["relu4"] = x
    x = _fire(x, params["fire7"])                              # idx 11
    out["relu5"] = x
    x = _fire(x, params["fire8"])                              # idx 12
    out["relu6"] = x
    x = _fire(x, params["fire9"])                              # idx 13
    out["relu7"] = x
    return out


def convert_torchvision_squeezenet(state_dict):
    """torchvision squeezenet1_1 state dict -> tree. Keys:
    features.0.* (conv1), features.{3,4,6,7,9,10,11,12}.{squeeze,
    expand1x1,expand3x3}.*"""
    idx = {3: "fire2", 4: "fire3", 6: "fire4", 7: "fire5", 9: "fire6",
           10: "fire7", 11: "fire8", 12: "fire9"}
    params = init_squeezenet(jax.random.PRNGKey(0))
    for name, arr in state_dict.items():
        parts = name.split(".")
        if parts[0] != "features":
            continue
        arr = np.asarray(arr.detach().numpy() if hasattr(arr, "detach")
                         else arr, np.float32)
        if parts[1] == "0":
            slot = params["conv1"]
            leaf = parts[2]
        else:
            fire = idx.get(int(parts[1]))
            if fire is None:
                raise KeyError(f"unexpected squeezenet key {name!r}")
            slot = params[fire][parts[2]]
            leaf = parts[3]
        if tuple(slot[leaf].shape) != arr.shape:
            raise ValueError(f"shape mismatch for {name!r}")
        slot[leaf] = jnp.asarray(arr)
    return params

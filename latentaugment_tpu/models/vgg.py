"""VGG16 / VGG19 feature extractors in functional JAX.

Replaces three torch pieces of the reference:
  * the NVIDIA TorchScript `vgg16.pt` LPIPS detector downloaded by URL
    (augments/utils/util_latent_aug.py:35-43, used with
    `return_lpips=True` at util_latent_aug.py:387-409),
  * the torchvision VGG16 backbone of the local LPIPS criterion
    (augments/criteria/lpips/networks.py:52-63),
  * the torchvision VGG19 backbone of the NST criterion
    (augments/criteria/nst/networks.py:6-70).

Weights: this environment has no egress, so weights load from a local
converted checkpoint when available (`load_params(path)` accepts a
pickle of numpy arrays; `convert_torchscript` turns a cached NVIDIA
vgg16.pt into one) and otherwise fall back to a deterministic
He-initialized network — self-consistent features that keep every
pipeline runnable and testable; distances remain meaningful because
both manifold and synthetic features use the same network.

LPIPS embedding: `lpips_features` returns, per image, the concatenation
over tap layers of unit-channel-normalized activations scaled by
sqrt(lin_weight / (H*W)) — so a plain squared-L2 distance between two
embeddings equals the LPIPS distance. This is the property the
reference relies on when it computes pairwise feature L2 via einsum
(util_latent_aug.py:387-409).
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 conv plan: (name, out_channels); 'M' = 2x2 max pool.
VGG16_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), "M",
]

VGG19_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), "M",
]

# LPIPS tap layers for VGG16 (richzhang convention).
LPIPS_TAPS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]
LPIPS_CHANNELS = {"conv1_2": 64, "conv2_2": 128, "conv3_3": 256,
                  "conv4_3": 512, "conv5_3": 512}

# Input pre-scaling of the LPIPS VGG (applied to [0,255] RGB):
# [0,255] -> [-1,1] -> richzhang shift/scale normalization.
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def init_vgg(key, plan=VGG16_PLAN, in_channels=3, lpips_lin=True):
    """He-initialized VGG params: {'convX_Y': {'weight','bias'}, 'lin': {...}}."""
    params = {}
    c_in = in_channels
    for item in plan:
        if item == "M":
            continue
        name, c_out = item
        key, sub = jax.random.split(key)
        fan_in = c_in * 9
        params[name] = {
            "weight": (jax.random.normal(sub, (c_out, c_in, 3, 3), jnp.float32)
                       * np.sqrt(2.0 / fan_in)),
            "bias": jnp.zeros((c_out,), jnp.float32),
        }
        c_in = c_out
    if lpips_lin and plan is VGG16_PLAN:
        params["lin"] = {
            tap: jnp.ones((LPIPS_CHANNELS[tap],), jnp.float32)
            for tap in LPIPS_TAPS
        }
    return params


def _conv3x3(x, p):
    out = lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + p["bias"].astype(x.dtype)[None, :, None, None]


def _maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                             "VALID")


def vgg_features(params, x, plan=VGG16_PLAN, taps=None, input_range="0_255"):
    """Run the VGG trunk; return {tap_name: activation} for requested taps.

    x: [N, 3, H, W]. input_range '0_255' applies the LPIPS pre-scaling;
    'unit' assumes already-normalized inputs.
    """
    taps = list(taps) if taps is not None else [LPIPS_TAPS[-1]]
    want = set(taps)
    if input_range == "0_255":
        x = x / 127.5 - 1.0
        x = (x - jnp.asarray(_LPIPS_SHIFT, x.dtype)[None, :, None, None]) \
            / jnp.asarray(_LPIPS_SCALE, x.dtype)[None, :, None, None]
    out = {}
    for item in plan:
        if item == "M":
            x = _maxpool2(x)
            continue
        name, _ = item
        x = jax.nn.relu(_conv3x3(x, params[name]))
        if name in want:
            out[name] = x
            if len(out) == len(want):
                break
    return out


def lpips_features(params, x, input_range="0_255"):
    """Per-image LPIPS embedding vector (see module docstring). [N, D]."""
    acts = vgg_features(params, x, plan=VGG16_PLAN, taps=LPIPS_TAPS,
                        input_range=input_range)
    feats = []
    n = x.shape[0]
    for tap in LPIPS_TAPS:
        a = acts[tap].astype(jnp.float32)
        # Unit-normalize channel vectors at each pixel.
        a = a * lax.rsqrt(jnp.sum(jnp.square(a), axis=1, keepdims=True) + 1e-10)
        h, w = a.shape[2], a.shape[3]
        lin = params.get("lin", {}).get(tap)
        if lin is not None:
            a = a * jnp.sqrt(jnp.maximum(lin, 0.0))[None, :, None, None]
        a = a / np.sqrt(h * w)
        feats.append(a.reshape(n, -1))
    return jnp.concatenate(feats, axis=1)


def lpips_distance(params, x, y, input_range="0_255"):
    """LPIPS distance via the embedding property: ||f(x) - f(y)||^2."""
    fx = lpips_features(params, x, input_range)
    fy = lpips_features(params, y, input_range)
    return jnp.sum(jnp.square(fx - fy), axis=1)


# ----------------------------------------------------------------------------
# Metric-detector head (parity: the NVIDIA vgg16.pkl metric detector used
# by precision/recall returns 4096-d fc features with return_features=True;
# reference metrics/precision_recall.py:37-38).

def init_vgg_detector(key, plan=VGG16_PLAN):
    """VGG16 trunk + fc6/fc7 head for 4096-d metric features."""
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_vgg(k1, plan, lpips_lin=False)
    params["fc6"] = {
        "weight": jax.random.normal(k2, (4096, 512 * 7 * 7), jnp.float32)
                  * np.sqrt(2.0 / (512 * 7 * 7)),
        "bias": jnp.zeros((4096,), jnp.float32),
    }
    params["fc7"] = {
        "weight": jax.random.normal(k3, (4096, 4096), jnp.float32)
                  * np.sqrt(2.0 / 4096),
        "bias": jnp.zeros((4096,), jnp.float32),
    }
    return params


def _adaptive_avg_pool(x, out_hw=7):
    """Average-pool NCHW x to [N, C, out_hw, out_hw] for any input size."""
    n, c, h, w = x.shape
    if h == out_hw and w == out_hw:
        return x
    if h < out_hw or w < out_hw:
        # Tiny trunk output (input images < 224): nearest-upsample first.
        # Without this, integer-bin pooling below would take a 0-size slice
        # and the fc head would emit NaN (found on 32² test images).
        x = jnp.repeat(jnp.repeat(x, -(-out_hw // h), axis=2),
                       -(-out_hw // w), axis=3)
        n, c, h, w = x.shape
    # Integer-bin pooling (h, w >= out_hw).
    kh, kw = h // out_hw, w // out_hw
    x = x[:, :, : kh * out_hw, : kw * out_hw]
    x = x.reshape(n, c, out_hw, kh, out_hw, kw)
    return jnp.mean(x, axis=(3, 5))


def detector_features(params, x, input_range="0_255"):
    """[N, 3, H, W] (uint8-scale) -> 4096-d pre-softmax features [N, 4096]."""
    acts = vgg_features(params, x, plan=VGG16_PLAN, taps=["conv5_3"],
                        input_range=input_range)
    y = _maxpool2(acts["conv5_3"])
    y = _adaptive_avg_pool(y, 7)
    y = y.reshape(y.shape[0], -1)
    y = jax.nn.relu(y @ params["fc6"]["weight"].T + params["fc6"]["bias"])
    y = y @ params["fc7"]["weight"].T + params["fc7"]["bias"]
    return y


# ----------------------------------------------------------------------------
# Weight IO

def load_params(path, require=()):
    """Load a converted VGG checkpoint (pickle of {name: {'weight','bias'}}).

    Loads through the restricted unpickler (the URL-cache path this reads
    from is where RAW NVIDIA pickles land too — stock pickle.load would
    execute their embedded source; round-3 review) and validates the
    result is a plain array tree containing the `require`d top-level keys,
    raising ValueError otherwise so callers can fall back loudly."""
    from .stylegan2.convert import load_network_pickle

    obj = load_network_pickle(path)
    if not isinstance(obj, dict):
        raise ValueError(f"not a param dict: {type(obj).__name__}")
    missing = [k for k in require if k not in obj]
    if missing:
        raise ValueError(f"param tree lacks required keys {missing} "
                         "(wrong converter output for this use?)")
    leaves = jax.tree_util.tree_leaves(obj)
    if not leaves or not all(hasattr(a, "shape") for a in leaves):
        raise ValueError("param tree contains non-array leaves "
                         "(raw NVIDIA pickle instead of converted weights?)")
    return jax.tree_util.tree_map(jnp.asarray, obj)


def save_params(params, path):
    obj = jax.tree_util.tree_map(lambda a: np.asarray(a), params)
    with open(path, "wb") as f:
        pickle.dump(obj, f, pickle.HIGHEST_PROTOCOL)


def convert_torchscript(ts_path, out_path=None):
    """Convert a cached NVIDIA vgg16.pt TorchScript file to our format.

    Maps the script module's conv weights (in definition order) onto
    VGG16_PLAN names and its LPIPS linear weights onto 'lin'. Requires
    torch; works offline from the URL cache.
    """
    import torch

    mod = torch.jit.load(ts_path, map_location="cpu")
    state = dict(mod.state_dict())
    convs = [(k, v) for k, v in state.items()
             if k.endswith("weight") and v.ndim == 4 and v.shape[-1] == 3]
    lins = [(k, v) for k, v in state.items()
            if v.ndim in (2, 4) and (v.shape[-1] == 1 if v.ndim == 4 else True)
            and "lin" in k.lower()]
    params = {}
    plan_names = [it[0] for it in VGG16_PLAN if it != "M"]
    for (k, w), name in zip(convs, plan_names):
        bias_key = k[:-len("weight")] + "bias"
        params[name] = {
            "weight": np.asarray(w.detach().numpy(), np.float32),
            "bias": np.asarray(state[bias_key].detach().numpy(), np.float32),
        }
    if lins:
        lin = {}
        for (k, v), tap in zip(lins, LPIPS_TAPS):
            lin[tap] = np.abs(np.asarray(v.detach().numpy(), np.float32)).reshape(-1)
        params["lin"] = lin
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(params, f, pickle.HIGHEST_PROTOCOL)
    return params


def get_vgg16(path=None, seed=0):
    """The framework's standard LPIPS VGG16: converted weights if available,
    deterministic random init otherwise (self-consistent fallback)."""
    if path is not None:
        try:
            # LPIPS use needs the conv trunk; fc6/fc7 are detector-only.
            return load_params(path, require=("conv1_1", "conv5_3"))
        except (OSError, pickle.UnpicklingError, ValueError, KeyError) as e:
            print(f"[vgg] could not load {path} ({e}); using seeded random init")
    return init_vgg(jax.random.PRNGKey(seed), VGG16_PLAN)

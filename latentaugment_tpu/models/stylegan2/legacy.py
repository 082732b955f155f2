"""Convert TF-era (StyleGAN2 TensorFlow) network pickles to our param trees.

Parity: reference models/stylegan3/legacy.py — detects `dnnlib.tflib`
Network objects inside the pickle via a stub unpickler (no TensorFlow
needed), collects the variable dict, and applies the canonical TF->torch
name/layout transforms (legacy.py:171-203 for G, :271-288 for D):
dense weights transposed, conv weights [kh,kw,I,O] -> [O,I,kh,kw],
up-conv weights additionally spatially flipped, `mod_bias + 1`, noise
buffers squeezed, `dlatent_avg` -> w_avg. Output feeds directly into
networks.generator_apply / discriminator_apply.
"""

import math
import pickle

import numpy as np

from ...utils.util_easydict import EasyDict
from . import networks


class TFNetworkStub(EasyDict):
    """Stands in for dnnlib.tflib.network.Network during unpickling."""

    def __setstate__(self, state):
        self.update(state)


class _LegacyUnpickler(pickle.Unpickler):
    """Exact-name allowlist unpickler for TF-era pickles.

    TF pickles only need numpy array reconstruction plus the dnnlib
    Network stubs; torch tensors appear in mixed modern pickles fed to
    the same CLI. No builtins namespace, no wildcard module lookups —
    find_class('builtins','eval') must raise (round-1 ADVICE high).
    """

    def find_class(self, module, name):
        if module == "dnnlib.tflib.network" and name == "Network":
            return TFNetworkStub
        if module == "dnnlib" or module.startswith("dnnlib."):
            return EasyDict
        from .convert import _allowed_globals

        fn = _allowed_globals().get((module, name))
        if fn is None:
            raise pickle.UnpicklingError(
                f"Blocked unpickle of {module}.{name} — not in the exact-name "
                "allowlist of tensor-reconstruction callables")
        return fn


def load_network_pkl(f, force_fp16=False):
    """Load a legacy or modern pickle; returns dict with 'G_ema'/'D' entries
    converted to (params, cfg) pairs when they are TF networks."""
    if hasattr(f, "read"):
        data = _LegacyUnpickler(f).load()
    else:
        with open(f, "rb") as fh:
            data = _LegacyUnpickler(fh).load()

    # Legacy TF pickle: tuple of 3 networks (G, D, Gs).
    if isinstance(data, tuple) and len(data) == 3 and \
            all(isinstance(net, TFNetworkStub) for net in data):
        tf_G, tf_D, tf_Gs = data
        g_params, g_cfg = convert_tf_generator(tf_Gs)
        d_params, d_cfg = convert_tf_discriminator(tf_D)
        return dict(G_ema=(g_params, g_cfg), D=(d_params, d_cfg))

    out = {}
    for key, val in (data.items() if isinstance(data, dict) else []):
        if isinstance(val, TFNetworkStub):
            if key in ("G", "G_ema", "Gs"):
                out[key] = convert_tf_generator(val)
            elif key == "D":
                out[key] = convert_tf_discriminator(val)
        else:
            out[key] = val
    return out or data


def _collect_tf_params(tf_net):
    tf_params = {}

    def recurse(prefix, net):
        for name, value in net.get("variables", []):
            tf_params[prefix + name] = np.asarray(value)
        for name, comp in net.get("components", {}).items():
            recurse(prefix + name + "/", comp)

    recurse("", tf_net)
    return tf_params


def _conv(v):
    return np.asarray(v, np.float32).transpose(3, 2, 0, 1)  # khkwIO -> OIHW


def _conv_up(v):
    return np.asarray(v, np.float32)[::-1, ::-1].transpose(3, 2, 0, 1)


def _dense(v):
    return np.asarray(v, np.float32).transpose()


def convert_tf_generator(tf_G):
    if tf_G.get("version", 0) < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = tf_G.get("static_kwargs", {})
    cfg = networks.generator_config(
        z_dim=kw.get("latent_size", 512),
        c_dim=kw.get("label_size", 0),
        w_dim=kw.get("dlatent_size", 512),
        img_resolution=kw.get("resolution", 1024),
        img_channels=kw.get("num_channels", 3),
        channel_base=kw.get("fmap_base", 16384) * 2,
        channel_max=kw.get("fmap_max", 512),
        num_mapping_layers=kw.get("mapping_layers", 8),
        conv_clamp=kw.get("conv_clamp", None),
        mapping_lr_multiplier=kw.get("mapping_lrmul", 0.01),
    )
    p = _collect_tf_params(tf_G)

    mapping = {"w_avg": np.asarray(p["dlatent_avg"], np.float32)}
    for i in range(cfg.num_mapping_layers):
        mapping[f"fc{i}"] = {"weight": _dense(p[f"mapping/Dense{i}/weight"]),
                             "bias": np.asarray(p[f"mapping/Dense{i}/bias"], np.float32)}
    if cfg.c_dim > 0:
        # Conditional TF generator: LabelEmbed -> mapping embed (reference
        # legacy.py:173-174). Round-3 review: previously c_dim>0 configs
        # were emitted with no embed params, crashing at first apply.
        if "mapping/LabelEmbed/weight" not in p:
            raise ValueError(
                "conditional TF generator (label_size > 0) has no "
                "mapping/LabelEmbed variables — unsupported pickle layout")
        embed_w = _dense(p["mapping/LabelEmbed/weight"])
        mapping["embed"] = {
            "weight": embed_w,
            "bias": np.asarray(p["mapping/LabelEmbed/bias"], np.float32)}
        cfg.embed_features = int(embed_w.shape[0])

    def conv_layer(prefix, noise_idx, up=False):
        return {
            "weight": (_conv_up if up else _conv)(p[f"{prefix}/weight"]),
            "bias": np.asarray(p[f"{prefix}/bias"], np.float32),
            "noise_const": np.asarray(p[f"synthesis/noise{noise_idx}"],
                                      np.float32)[0, 0],
            "noise_strength": np.asarray(p[f"{prefix}/noise_strength"],
                                         np.float32).reshape(()),
            "affine": {"weight": _dense(p[f"{prefix}/mod_weight"]),
                       "bias": np.asarray(p[f"{prefix}/mod_bias"],
                                          np.float32) + 1.0},
        }

    def torgb_layer(prefix):
        return {
            "weight": _conv(p[f"{prefix}/weight"]),
            "bias": np.asarray(p[f"{prefix}/bias"], np.float32),
            "affine": {"weight": _dense(p[f"{prefix}/mod_weight"]),
                       "bias": np.asarray(p[f"{prefix}/mod_bias"],
                                          np.float32) + 1.0},
        }

    synthesis = {}
    for res in cfg.block_resolutions:
        block = {}
        if res == 4:
            block["const"] = np.asarray(p["synthesis/4x4/Const/const"],
                                        np.float32)[0]
            block["conv1"] = conv_layer("synthesis/4x4/Conv", 0)
        else:
            lg = int(math.log2(res))
            block["conv0"] = conv_layer(f"synthesis/{res}x{res}/Conv0_up",
                                        lg * 2 - 5, up=True)
            block["conv1"] = conv_layer(f"synthesis/{res}x{res}/Conv1",
                                        lg * 2 - 4)
        block["torgb"] = torgb_layer(f"synthesis/{res}x{res}/ToRGB")
        synthesis[f"b{res}"] = block
    from ...ops import setup_filter

    synthesis["resample_filter"] = np.asarray(
        setup_filter(kw.get("resample_kernel", [1, 3, 3, 1]), separable=True))

    return {"mapping": mapping, "synthesis": synthesis}, cfg


def convert_tf_discriminator(tf_D):
    if tf_D.get("version", 0) < 4:
        raise ValueError("TensorFlow pickle version too low")
    kw = tf_D.get("static_kwargs", {})
    cfg = networks.discriminator_config(
        c_dim=kw.get("label_size", 0),
        img_resolution=kw.get("resolution", 1024),
        img_channels=kw.get("num_channels", 3),
        channel_base=kw.get("fmap_base", 16384) * 2,
        channel_max=kw.get("fmap_max", 512),
        conv_clamp=kw.get("conv_clamp", None),
        mbstd_group_size=kw.get("mbstd_group_size", 4) or 4,
        mbstd_num_channels=kw.get("mbstd_num_features", 1),
        cmap_dim=kw.get("mapping_fmaps", None),
        mapping_lr_multiplier=kw.get("mapping_lrmul", 0.1),
    )
    p = _collect_tf_params(tf_D)

    tree = {}
    first = True
    for res in cfg.block_resolutions:
        block = {}
        if first:
            block["fromrgb"] = {"weight": _conv(p[f"{res}x{res}/FromRGB/weight"]),
                                "bias": np.asarray(p[f"{res}x{res}/FromRGB/bias"],
                                                   np.float32)}
            first = False
        block["conv0"] = {"weight": _conv(p[f"{res}x{res}/Conv0/weight"]),
                          "bias": np.asarray(p[f"{res}x{res}/Conv0/bias"],
                                             np.float32)}
        block["conv1"] = {"weight": _conv(p[f"{res}x{res}/Conv1_down/weight"]),
                          "bias": np.asarray(p[f"{res}x{res}/Conv1_down/bias"],
                                             np.float32)}
        block["skip"] = {"weight": _conv(p[f"{res}x{res}/Skip/weight"])}
        tree[f"b{res}"] = block

    tree["b4"] = {
        "conv": {"weight": _conv(p["4x4/Conv/weight"]),
                 "bias": np.asarray(p["4x4/Conv/bias"], np.float32)},
        "fc": {"weight": _dense(p["4x4/Dense0/weight"]),
               "bias": np.asarray(p["4x4/Dense0/bias"], np.float32)},
        "out": {"weight": _dense(p["Output/weight"]),
                "bias": np.asarray(p["Output/bias"], np.float32)},
    }
    if cfg.c_dim > 0:
        # Conditional TF discriminator: LabelEmbed + Mapping{i} -> the
        # projection head's label-mapping subtree (reference
        # legacy.py:277-280). Round-3 review: previously c_dim>0 configs
        # were emitted with no 'mapping' subtree and a shape-wrong 'out',
        # crashing (or silently mis-projecting) at first apply.
        if "LabelEmbed/weight" not in p:
            raise ValueError(
                "conditional TF discriminator (label_size > 0) has no "
                "LabelEmbed variables — pre-projection conditional layouts "
                "(per-label Output columns) are unsupported")
        embed_w = _dense(p["LabelEmbed/weight"])
        cmap = {"embed": {
            "weight": embed_w,
            "bias": np.asarray(p["LabelEmbed/bias"], np.float32)}}
        n_map = 0
        while f"Mapping{n_map}/weight" in p:
            cmap[f"fc{n_map}"] = {
                "weight": _dense(p[f"Mapping{n_map}/weight"]),
                "bias": np.asarray(p[f"Mapping{n_map}/bias"], np.float32)}
            n_map += 1
        cfg.num_mapping_layers = n_map
        tree["mapping"] = cmap
        if n_map == 0 and int(embed_w.shape[0]) != cfg.cmap_dim:
            raise ValueError(
                f"conditional TF discriminator LabelEmbed width "
                f"{int(embed_w.shape[0])} != cmap_dim {cfg.cmap_dim} "
                "with no Mapping layers — projection shapes inconsistent")
        out_dim = int(tree["b4"]["out"]["weight"].shape[0])
        if out_dim != cfg.cmap_dim:
            raise ValueError(
                f"conditional TF discriminator Output width {out_dim} != "
                f"cmap_dim {cfg.cmap_dim} — not a projection head")
    from ...ops import setup_filter

    tree["resample_filter"] = np.asarray(
        setup_filter(kw.get("resample_kernel", [1, 3, 3, 1]), separable=True))
    return tree, cfg

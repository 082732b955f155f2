"""Ingest alias-free (StyleGAN3) checkpoints onto the functional tree.

Same contract as ../stylegan2/convert.py (restricted unpickling happens
there — this module only maps an already-extracted flat state dict and
init kwargs): torch state-dict names join to our nested param paths.
SG3 names: synthesis.input.{weight,affine.*,transform,freqs,phases},
synthesis.L{i}_{size}_{ch}.{affine.*,weight,bias,magnitude_ema,
up_filter,down_filter}, mapping.* as SG2.

Checkpoints trained at fp16 may store filters the designer regenerates
bit-identically from the config plan; stored buffers win when present.
"""

import numpy as np

from . import networks


def infer_generator_config(payload, img_resolution=None, img_channels=None):
    """Build our alias-free generator_config from persistence init kwargs.

    NVIDIA's Generator signature takes **synthesis_kwargs, so synthesis
    knobs (channel_base, conv_kernel, use_radial_filters, ...) sit at the
    TOP level of the stored init kwargs; mapping depth under
    mapping_kwargs.num_layers (2 in the published configs)."""
    from ..stylegan2.convert import _payload_init_kwargs

    kwargs = _payload_init_kwargs(payload)
    mapping = kwargs.get("mapping_kwargs", {}) or {}
    picked = {}
    for key in ("num_layers", "num_critical", "first_cutoff",
                "first_stopband", "last_stopband_rel", "margin_size",
                "output_scale", "conv_clamp", "conv_kernel", "filter_size",
                "lrelu_upsampling", "use_radial_filters", "channel_base",
                "channel_max"):
        if key in kwargs:
            picked[key] = kwargs[key]
    return networks.generator_config(
        z_dim=kwargs.get("z_dim", 512),
        c_dim=kwargs.get("c_dim", 0),
        w_dim=kwargs.get("w_dim", 512),
        img_resolution=img_resolution or kwargs.get("img_resolution", 256),
        img_channels=img_channels or kwargs.get("img_channels", 2),
        num_mapping_layers=mapping.get("num_layers", 2),
        embed_features=mapping.get("embed_features"),
        num_fp16_res=0,  # bf16 selection is a runtime knob on TPU
        **picked)


def generator_tree_from_state(state, cfg):
    """Map torch SG3 G state-dict names onto our nested param tree."""
    from ..stylegan2.convert import _set_path

    tree = {"mapping": {}, "synthesis": {}}
    for name, value in state.items():
        # All leaves (fc{i}.*, embed.*, w_avg, input.*, L*.*) are plain
        # float32 tensors at nested paths — one rule covers both nets.
        if name.startswith("mapping."):
            _set_path(tree["mapping"], name[len("mapping."):], value)
        elif name.startswith("synthesis."):
            _set_path(tree["synthesis"], name[len("synthesis."):], value)
        else:
            _set_path(tree, name, value)

    syn = tree["synthesis"]
    if "input" in syn and "transform" in syn["input"]:
        syn["input"]["transform"] = np.asarray(
            syn["input"]["transform"], np.float32).reshape(3, 3)
    for layer in cfg.layers:
        lp = syn.get(layer.name)
        if lp is None:
            raise ValueError(
                f"SG3 checkpoint is missing layer '{layer.name}' — the "
                "config plan (resolution/channels) does not match the "
                "stored state dict")
        if "magnitude_ema" in lp:
            lp["magnitude_ema"] = np.asarray(
                lp["magnitude_ema"], np.float32).reshape(())
        else:
            lp["magnitude_ema"] = np.ones((), np.float32)
        # Filters are deterministic from the plan; design any missing ones.
        fu, fd = networks._layer_filters(layer)
        if "up_filter" not in lp and fu is not None:
            lp["up_filter"] = fu
        if "down_filter" not in lp and fd is not None:
            lp["down_filter"] = fd
    return tree


def cfg_kwargs(cfg):
    """Round-trippable kwargs for save_checkpoint (includes arch tag).

    Plain dict on purpose: it is pickled into native checkpoints, and the
    restricted unpickler admits only builtin containers."""
    keys = ("z_dim", "c_dim", "w_dim", "img_resolution", "img_channels",
            "channel_base", "channel_max", "num_mapping_layers",
            "mapping_lr_multiplier", "embed_features", "num_layers",
            "num_critical", "first_cutoff", "first_stopband",
            "last_stopband_rel", "margin_size", "output_scale",
            "num_fp16_res", "conv_clamp", "conv_kernel", "filter_size",
            "lrelu_upsampling", "use_radial_filters")
    out = {"arch": "stylegan3"}
    for k in keys:
        if k in cfg:
            out[k] = cfg[k]
    return out

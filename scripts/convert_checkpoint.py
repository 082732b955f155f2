"""Checkpoint conversion CLI.

Parity: reference models/stylegan3/legacy.py click CLI (:293-316),
extended to every external weight source this framework consumes:

  * NVIDIA / persistence SG2 pickles  -> native nested-numpy checkpoint
  * TF-era SG2 pickles                -> native checkpoint (legacy tables)
  * NVIDIA TorchScript vgg16.pt       -> LPIPS VGG16 params
  * torchvision inception_v3 .pth     -> FID InceptionV3 params

Run where the source files exist (needs torch for the torch formats);
the outputs are plain pickles of numpy trees, loadable with zero torch.
"""

import sys

import click


@click.group()
def main():
    """LatentAugment-TPU checkpoint converters."""


@main.command()
@click.option("--source", required=True, help="SG2 pickle (NVIDIA or TF-era)")
@click.option("--dest", required=True, help="output native checkpoint path")
@click.option("--img_resolution", type=int, default=None)
@click.option("--img_channels", type=int, default=None)
def stylegan(source, dest, img_resolution, img_channels):
    """Convert a StyleGAN2 network pickle to the native format."""
    sys.path.insert(0, ".")
    from latentaugment_tpu.models.stylegan2 import convert, legacy

    try:
        g_params, g_cfg, d_params, d_cfg = convert.load_stylegan(
            source, img_resolution=img_resolution, img_channels=img_channels)
    except Exception as modern_err:
        click.echo(f"modern loader failed ({modern_err}); trying legacy TF path")
        data = legacy.load_network_pkl(source)
        g_params, g_cfg = data["G_ema"]
        d_params, d_cfg = data.get("D", (None, None))
    convert.save_checkpoint(dest, g_params, g_cfg, d_params, d_cfg)
    click.echo(f"wrote {dest} (num_ws={g_cfg.num_ws}, "
               f"res={g_cfg.img_resolution})")


@main.command()
@click.option("--source", required=True, help="NVIDIA vgg16.pt torchscript")
@click.option("--dest", required=True)
def vgg16(source, dest):
    """Convert the NVIDIA LPIPS VGG16 torchscript to native params."""
    sys.path.insert(0, ".")
    from latentaugment_tpu.models import vgg

    vgg.convert_torchscript(source, dest)
    click.echo(f"wrote {dest}; point LATENTAUGMENT_VGG16 at it")


@main.command()
@click.option("--source", required=True, help="torchvision inception_v3 state_dict .pth")
@click.option("--dest", required=True)
def inception(source, dest):
    """Convert torchvision InceptionV3 weights to native params."""
    sys.path.insert(0, ".")
    import torch

    from latentaugment_tpu.models import inception as inc

    state = torch.load(source, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    inc.convert_torchvision_state(state, dest)
    click.echo(f"wrote {dest}")


if __name__ == "__main__":
    main()

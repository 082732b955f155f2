from . import vgg  # noqa: F401
from .stylegan2 import networks, convert  # noqa: F401


def networks_for(cfg):
    """Generator-module dispatch on the config's arch tag.

    SG2 and the alias-free (SG3) family share the mapping/synthesis
    apply contract; the 'arch' tag (set by each family's
    generator_config and preserved by convert's loaders/checkpoints)
    picks the module. Accepts any mapping with .get — an EasyDict cfg
    or a plain {'arch': ...} dict. The discriminator is always the SG2
    one (the alias-free family trains against it unchanged), so D
    needs no dispatch.
    """
    if cfg.get("arch") == "stylegan3":
        from .stylegan3 import networks as networks_sg3

        return networks_sg3
    return networks

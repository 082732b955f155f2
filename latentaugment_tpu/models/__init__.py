from . import vgg  # noqa: F401
from .stylegan2 import networks, convert  # noqa: F401

from .bias_act import bias_act, activation_funcs  # noqa: F401
from .upfirdn2d import (  # noqa: F401
    upfirdn2d, setup_filter, upsample2d, downsample2d, filter2d,
)
from .conv2d_resample import conv2d_resample  # noqa: F401
from .modulated_conv import modulated_conv2d  # noqa: F401
from .grid_sample import grid_sample  # noqa: F401
from .fma import fma  # noqa: F401
from .filtered_lrelu import filtered_lrelu  # noqa: F401

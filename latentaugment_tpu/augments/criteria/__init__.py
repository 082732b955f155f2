from .lpips import LPIPS  # noqa: F401
from .nst import NSTLoss, gram_matrix  # noqa: F401

from . import util_easydict, util_general, util_io, util_logger, util_path  # noqa: F401

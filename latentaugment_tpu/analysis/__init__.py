from . import hpo  # noqa: F401

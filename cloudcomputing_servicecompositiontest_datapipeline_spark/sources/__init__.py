from . import star  # noqa: F401

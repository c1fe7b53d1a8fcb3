from .exact import dsum, davg, dround  # noqa: F401

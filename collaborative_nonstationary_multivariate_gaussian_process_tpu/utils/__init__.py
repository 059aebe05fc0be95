from . import checkpoint, data, metrics  # noqa: F401

from . import classify, metrics  # noqa: F401

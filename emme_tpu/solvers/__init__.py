from . import eigen  # noqa: F401

from . import query  # noqa: F401

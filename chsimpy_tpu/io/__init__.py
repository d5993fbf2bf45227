from . import csvio, yamlio  # noqa: F401

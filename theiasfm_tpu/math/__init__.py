from . import polynomial, rotation  # noqa: F401

from . import c2c, matrices, r2r, real  # noqa: F401

from . import cg, rk4  # noqa: F401

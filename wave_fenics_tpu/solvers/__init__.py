from . import cg, newmark, rk4  # noqa: F401

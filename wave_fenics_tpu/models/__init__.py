from . import linear_wave, planar3d  # noqa: F401

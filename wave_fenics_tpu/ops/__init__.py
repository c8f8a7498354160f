from . import gather_scatter  # noqa: F401

from . import checkpoint, config, logging, profiling, timing  # noqa: F401

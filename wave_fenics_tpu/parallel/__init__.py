from . import halo, partition, sharded_wave  # noqa: F401

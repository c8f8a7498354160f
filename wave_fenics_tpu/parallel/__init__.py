from . import distributed, halo, partition, sharded_padded, sharded_wave  # noqa: F401

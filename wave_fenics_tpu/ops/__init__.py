from . import element_kernels, gather_scatter, operators  # noqa: F401

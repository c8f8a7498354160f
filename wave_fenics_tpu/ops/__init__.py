from . import (  # noqa: F401
    assembled,
    element_kernels,
    gather_scatter,
    la,
    operators,
    pallas_stiffness,
    pallas_wave,
    separable,
)

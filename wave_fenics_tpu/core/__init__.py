from . import basis, dofmap, geometry, mesh  # noqa: F401
from . import io  # noqa: F401

from . import basis, dofmap, geometry, mesh  # noqa: F401

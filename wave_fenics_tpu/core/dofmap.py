"""Continuous-Galerkin dof numbering on hexes, tensor-product order first.

Replaces the DOLFINx dofmap machinery the reference leans on
(``V->dofmap()->list()``, common/operators.hpp:56) plus the runtime
tensor-product reordering (``reorder_dofmap``, common/permute.hpp:10-28):
our native numbering is lexicographic/tensor-product from the start, so no
permutation ever appears on the hot path.

Two representations:

1. Structured (``StructuredDofGrid``): the global dof vector IS a 3D grid
   ``[Nx, Ny, Nz]`` with ``Nd = n_cells_d * p + 1``. Element dof tensors
   ``[nc, p+1, p+1, p+1]`` map to grid blocks by pure reshape/overlap-add
   (see ops.gather_scatter) — zero indexed gather/scatter on TPU.

2. General (``build_dofmap``): explicit ``dofmap[nc, (p+1)^3]`` built by
   geometric dedup of element node coordinates, for imported hex meshes.
   Consumed by the jnp.take / segment_sum operator path.

Element-local tensors use axes [c, i, j, k] with i->x, j->y, k->z and
C-order flattening (z fastest), matching geometry.quadrature_points_3d.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .basis import gll_points_weights
from .mesh import HexMesh, StructuredBoxMesh

__all__ = ["StructuredDofGrid", "build_dofmap", "GeneralDofMap", "morton_cell_order"]


@dataclass(frozen=True)
class StructuredDofGrid:
    """Degree-p GLL dof grid over a structured box mesh."""

    mesh: StructuredBoxMesh
    p: int

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return tuple(n * self.p + 1 for n in self.mesh.shape)

    @property
    def ndofs(self) -> int:
        gx, gy, gz = self.grid_shape
        return gx * gy * gz

    @property
    def ncells(self) -> int:
        return self.mesh.ncells

    def axis_coords(self, axis: int) -> np.ndarray:
        """Physical node coordinates along one axis, shape [n*p+1]."""
        n = self.mesh.shape[axis]
        h = self.mesh.h[axis]
        o = self.mesh.origin[axis]
        nodes, _ = gll_points_weights(self.p + 1)
        line = o + h * (np.arange(n)[:, None] + nodes[None, :])  # [n, p+1]
        return np.concatenate([line[:, :-1].ravel(), line[-1:, -1]])

    def dof_coords_grid(self) -> np.ndarray:
        """Node coordinates as [Nx, Ny, Nz, 3]."""
        x = self.axis_coords(0)
        y = self.axis_coords(1)
        z = self.axis_coords(2)
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        return np.stack([X, Y, Z], axis=-1)

    def dofmap(self) -> np.ndarray:
        """Explicit dofmap [ncells, (p+1)^3] (flat global ids, C-order grid).

        Only needed by the general/segment-sum path and by tests; the
        structured operators never materialize it.
        """
        nx, ny, nz = self.mesh.shape
        gx, gy, gz = self.grid_shape
        p = self.p
        m = p + 1
        ax = [np.arange(n)[:, None] * p + np.arange(m)[None, :] for n in (nx, ny, nz)]
        # cells ordered x slowest (C-order over (cx, cy, cz))
        gi = ax[0][:, None, None, :, None, None]  # [nx,1,1,m,1,1]
        gj = ax[1][None, :, None, None, :, None]
        gk = ax[2][None, None, :, None, None, :]
        flat = (gi * gy + gj) * gz + gk  # broadcast [nx,ny,nz,m,m,m]
        return flat.reshape(nx * ny * nz, m * m * m).astype(np.int32)


@dataclass(frozen=True)
class GeneralDofMap:
    """Explicit dofmap for a general hex mesh (geometric dedup numbering)."""

    dofmap: np.ndarray  # [nc, (p+1)^3] int32
    ndofs: int
    dof_coords: np.ndarray  # [ndofs, 3]
    p: int
    #: cell permutation applied before numbering (reorder='morton');
    #: apply the same order to any per-cell data (mesh.cells[cell_order])
    cell_order: np.ndarray | None = None

    @property
    def ncells(self) -> int:
        return self.dofmap.shape[0]


def morton_cell_order(mesh: HexMesh, bits: int = 10) -> np.ndarray:
    """Cell permutation by Morton (Z-order) code of cell centroids.

    Sorting cells along a space-filling curve makes neighboring cells (and
    hence their shared dofs) adjacent in the batch dimension — better
    gather/scatter locality for the indexed operator family on TPU.
    """
    c = mesh.cell_coords().mean(axis=1)
    lo = c.min(axis=0)
    span = np.maximum(c.max(axis=0) - lo, 1e-300)
    q = np.clip(((c - lo) / span * (2**bits - 1)).astype(np.uint64), 0,
                2**bits - 1)

    def spread(v):
        out = np.zeros_like(v)
        for b in range(bits):
            out |= ((v >> np.uint64(b)) & np.uint64(1)) << np.uint64(3 * b)
        return out

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code, kind="stable")


def build_dofmap(
    mesh: HexMesh, p: int, tol: float = 1e-9,
    reorder: str | None = "appearance",
) -> GeneralDofMap:
    """CG dof numbering by geometric dedup of trilinear-mapped GLL nodes.

    Nodes on shared faces/edges coincide exactly under the trilinear map
    (face restriction depends only on face vertices), so rounding-based
    dedup at relative tolerance ``tol`` is exact for non-degenerate meshes.

    ``reorder='appearance'`` (default) keeps the cell order but numbers
    dofs by first appearance in the cell-major traversal — consecutive
    cells touch a narrow contiguous id range, which the fused windowed
    operator (ops.general_tables) depends on. ``reorder='morton'``
    additionally renumbers CELLS along a Z-order curve (for meshes whose
    native cell order has no locality); callers must then apply the same
    cell order to any per-cell data. ``reorder=None`` numbers dofs by
    sorted geometric key (legacy).
    """
    cell_order = None
    if reorder == "morton":
        cell_order = morton_cell_order(mesh)
        mesh = HexMesh(points=mesh.points, cells=mesh.cells[cell_order])
    elif reorder == "appearance":
        pass  # keep the cell order; only renumber dofs by appearance
    from .geometry import trilinear_tabulate

    nodes, _ = gll_points_weights(p + 1)
    m = p + 1
    X, Y, Z = np.meshgrid(nodes, nodes, nodes, indexing="ij")
    ref_pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)  # [(p+1)^3, 3]
    phi, _ = trilinear_tabulate(ref_pts)  # [nd, 8]
    # batched BLAS matmul (phi @ cc[c] per cell) — equivalent to
    # einsum("nv,cvi->cni") but multithreaded
    coords = np.matmul(phi, mesh.cell_coords())  # [nc, nd, 3]

    scale = max(np.abs(mesh.points).max(), 1.0)
    # quantize with preallocated out= buffers: fresh 1-GB ufunc temps
    # page-fault this to ~10x the arithmetic cost at production sizes
    flat = coords.reshape(-1, 3)
    buf = np.empty_like(flat)
    np.multiply(flat, 1.0 / (scale * tol), out=buf)
    np.rint(buf, out=buf)
    key = buf.astype(np.int64)

    from .. import native

    appearance_numbered = False
    if mesh.ncells >= 1024 and native.available():
        inv, ndofs = native.dedup_dofs(key)
        # the hash dedup numbers ids by first appearance in the
        # flattened cell-major traversal — already the target order
        appearance_numbered = True
    else:
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        ndofs = uniq.shape[0]
    if reorder in ("morton", "appearance") and not appearance_numbered:
        # Renumber dofs by FIRST APPEARANCE in the cell-major traversal —
        # the documented contract, and what the fused windowed operator
        # (ops.general_tables) relies on: a run of consecutive cells then
        # touches a narrow contiguous id range.
        # (np.unique/dedup numbers by sorted coordinate key instead.)
        _, first = np.unique(inv, return_index=True)
        order = np.argsort(first, kind="stable")  # old ids by appearance
        new_of_old = np.empty(ndofs, dtype=np.int64)
        new_of_old[order] = np.arange(ndofs)
        inv = new_of_old[inv]
    dofmap = inv.reshape(coords.shape[0], m * m * m).astype(np.int32)
    dof_coords = np.zeros((ndofs, 3))
    dof_coords[dofmap.ravel()] = coords.reshape(-1, 3)
    return GeneralDofMap(
        dofmap=dofmap, ndofs=ndofs, dof_coords=dof_coords, p=p,
        cell_order=cell_order,
    )

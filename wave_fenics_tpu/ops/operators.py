"""Matrix-free global operators: gather -> element kernel -> scatter.

Grid-level equivalents of the reference operator layer (SURVEY.md §1 L3):
- ``MassOperator`` (GPU fused)          common/cuda/mass.hpp:17-107
- ``SpectralMassOperator`` (diagonal)   common/cuda/spectral_mass.hpp:23-100
- ``MassOperatorCPU``                   common/operators.hpp:43-109
- ``StiffnessOperator``                 common/operators.hpp:136-201
  (with c0 as a runtime parameter, fixing the reference's hardcoded
   c0=1500 wart at common/operators.hpp:114)

Two families:

- ``StructuredOperators``: structured-box fast path — overlap gather/scatter,
  diagonal geometric factor, everything closed over as jnp constants. Apply
  functions are pure ``grid -> grid`` maps, jit/vmap/shard_map-safe.
- ``GeneralOperators``: explicit-dofmap path (imported meshes), full 3x3 G,
  jnp.take / sorted-scatter data movement on flat dof vectors.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry
from ..core.basis import tabulate_1d
from ..core.dofmap import GeneralDofMap
from ..core.mesh import HexMesh, StructuredBoxMesh
from . import element_kernels as ek
from . import gather_scatter as gs

__all__ = ["StructuredOperators", "GeneralOperators"]


@dataclass(frozen=True)
class StructuredOperators:
    """Matrix-free operators on a structured GLL dof grid.

    Built once per (mesh, p, dtype); all tables are tiny jnp constants that
    jit folds into the compiled program.
    """

    mesh: StructuredBoxMesh
    p: int
    dtype: type = jnp.float32
    #: optional per-cell stiffness coefficient (heterogeneous media); when
    #: set, stiffness() uses the per-cell kernel (separable/fused paths
    #: require a uniform coefficient). Shape [ncells].
    coeff_cells: object = None

    def __post_init__(self):
        tab = tabulate_1d(self.p)
        assert tab.collocated, "structured operators assume GLL collocation"
        m = self.p + 1
        Gdiag, detJw = geometry.structured_geometric_factors(self.mesh, self.p)
        # Tables are kept as NumPy: jnp ops treat them as compile-time
        # constants, and (unlike jnp arrays created lazily) they can never
        # leak tracers when an operator is first built inside a jit trace.
        npdt = np.dtype(self.dtype)
        object.__setattr__(self, "_D", tab.D.astype(npdt))
        object.__setattr__(self, "_detJw", detJw.reshape(1, m, m, m).astype(npdt))
        Gd = Gdiag.reshape(1, m, m, m, 3).astype(npdt)
        if self.coeff_cells is not None:
            cc = np.asarray(self.coeff_cells, dtype=npdt)
            Gd = Gd * cc[:, None, None, None, None]
        object.__setattr__(self, "_Gdiag", Gd)
        from .separable import grid_lines, separable_stiffness_tables

        A, _ = separable_stiffness_tables(self.p, self.mesh.h, self.dtype)
        object.__setattr__(self, "_sepA", A)
        object.__setattr__(
            self, "_seplines", grid_lines(self.mesh.shape, self.p, self.dtype)
        )

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        return tuple(n * self.p + 1 for n in self.mesh.shape)

    @property
    def ndofs(self) -> int:
        gx, gy, gz = self.grid_shape
        return gx * gy * gz

    # -- data movement -------------------------------------------------
    def gather(self, x: jax.Array) -> jax.Array:
        return gs.gather_grid(x, self.p)

    def scatter(self, ye: jax.Array) -> jax.Array:
        return gs.scatter_grid(ye, self.p, self.mesh.shape)

    # -- operators ------------------------------------------------------
    def spectral_mass(self, x: jax.Array) -> jax.Array:
        """y = M x for the GLL-collocated (spectral) mass.

        The reference implements this as gather -> pointwise detJw ->
        atomic scatter (common/cuda/spectral_mass.hpp:84-89) because its
        dofs are indirection-mapped. On a structured grid the globally
        assembled M is diagonal, so the whole apply is one fused
        elementwise multiply by the precomputed diagonal — pure HBM
        bandwidth, no data movement. The reference-shaped 3-pass route is
        kept as :meth:`spectral_mass_roundtrip` (same values to fp
        roundoff; exercised by the oracle/determinism tests and the
        scatter benchmark)."""
        return self.lumped_mass * x

    def spectral_mass_roundtrip(self, x: jax.Array) -> jax.Array:
        """y = M x via gather -> pointwise detJw -> scatter — the
        reference's data-movement shape (spectral_mass.hpp:84-89)."""
        return self.scatter(ek.spectral_mass_element(self.gather(x), self._detJw))

    @cached_property
    def lumped_mass(self) -> np.ndarray:
        """m = M @ 1 as a grid — the diagonal of M under GLL collocation
        (LinearGLL.hpp:105-110). Mass matvec == pointwise m*x.

        Closed form on structured boxes: the separable overlap-add of 1D
        GLL weight lines (NumPy constant; trace-safe)."""
        from ..core.basis import lumped_weight_line

        lines = [
            lumped_weight_line(self.mesh.shape[d], self.p, self.mesh.h[d])
            for d in range(3)
        ]
        return np.einsum("i,j,k->ijk", *lines).astype(np.dtype(self.dtype))

    def mass(self, x: jax.Array) -> jax.Array:
        """Collocated mass matvec via the lumped vector (pointwise)."""
        return self.lumped_mass * x

    def mass_gauss(self, x: jax.Array, q: int | None = None) -> jax.Array:
        """Consistent (non-lumped) mass matvec with Gauss quadrature — the
        CEED BP1 operator (demo/gpu_cg/bp1.ufl:20-21, quadrature p+2).

        On a uniform box the operator is an exact Kronecker product of 1D
        assembled mass matrices, so the matvec is three sequential banded
        contractions (ops.separable.mass_separable); on TPU a single fused
        Pallas pass (ops.pallas_mass) reads/writes HBM once.
        """
        import os

        from .separable import mass_separable, separable_mass_tables

        M1 = separable_mass_tables(self.p, self.mesh.h, self.dtype, q=q)
        if (
            jax.default_backend() == "tpu"
            and not os.environ.get("WAVE_FENICS_TPU_NO_PALLAS")
        ):
            from .pallas_mass import mass_fused

            return mass_fused(x, M1, self.p)
        return mass_separable(x, M1, self.p)

    def stiffness(self, x: jax.Array, c0: float | jax.Array = 1.0) -> jax.Array:
        """y = -c0^2 * K x (sign convention of the reference skernel,
        common/operators.hpp:114-133).

        Dispatch: on TPU with a static c0, the fused Pallas stencil kernel
        (ops.pallas_stiffness, one HBM pass); otherwise the XLA separable
        grid-space formulation (ops.separable)."""
        import os

        if self.coeff_cells is not None:
            # heterogeneous coefficient: only the per-cell kernel applies
            return self.stiffness_percell(x, c0)
        static_c0 = isinstance(c0, (int, float))
        if (
            static_c0
            and jax.default_backend() == "tpu"
            and not os.environ.get("WAVE_FENICS_TPU_NO_PALLAS")
        ):
            from .pallas_stiffness import stiffness_fused

            return stiffness_fused(
                x, self._sepA, self._seplines, self.p, -float(c0) ** 2
            )
        from .separable import stiffness_separable

        coeff = -jnp.asarray(c0, dtype=self.dtype) ** 2
        return stiffness_separable(x, self._sepA, self._seplines, self.p, coeff)

    def stiffness_percell(
        self, x: jax.Array, c0: float | jax.Array = 1.0
    ) -> jax.Array:
        """Generic per-cell path (gather -> element contraction -> scatter);
        kept as the cross-implementation oracle and for benchmarks."""
        coeff = -jnp.asarray(c0, dtype=self.dtype) ** 2
        ye = ek.stiffness_element_diag(self.gather(x), self._D, self._Gdiag, coeff)
        return self.scatter(ye)


@dataclass(frozen=True)
class GeneralOperators:
    """Matrix-free operators over an explicit dofmap (imported hex meshes).

    Supports non-collocated quadrature (``rule='gauss'`` — the decomposed
    B^T D B pipeline of demo/gpu_operator) and full 3x3 geometric factors.
    Vectors are flat ``[ndofs]`` arrays.
    """

    mesh: HexMesh
    dofs: GeneralDofMap
    dtype: type = jnp.float32
    q: int | None = None
    rule: str = "gll"
    #: optional per-cell stiffness coefficient (e.g. (c0(x)/c0_ref)^2 for
    #: heterogeneous media); folded into G at setup. Shape [ncells].
    coeff_cells: object = None
    #: 'ell' (transpose-gather, default) or 'sorted' (XLA sorted scatter)
    scatter_mode: str = "ell"
    #: run the fused kernel in its VMEM-resident variant (both vectors
    #: resident for the whole grid). Same speed as windowed (±5%), but a
    #: DIFFERENT Mosaic program: the platform's remote compiler has been
    #: observed to reject one variant and accept the other at some mesh
    #: sizes (docs/BENCH_NOTES.md round 3), so this doubles as an escape
    #: hatch.
    fused_resident: bool = False

    def __post_init__(self):
        p = self.dofs.p
        tab = tabulate_1d(p, self.q, self.rule)
        G, detJw = geometry.precompute_geometric_data(
            self.mesh, p, self.q, self.rule
        )
        if self.coeff_cells is not None:
            cc = np.asarray(self.coeff_cells, dtype=G.dtype)
            G = G * cc[:, None, None, None]
        nq1 = tab.nq
        nc = self.mesh.ncells
        npdt = np.dtype(self.dtype)
        object.__setattr__(self, "_tab", tab)
        object.__setattr__(self, "_B", tab.B.astype(npdt))
        object.__setattr__(self, "_D", tab.D.astype(npdt))
        object.__setattr__(
            self, "_detJw", detJw.reshape(nc, nq1, nq1, nq1).astype(npdt)
        )
        # affine-cell (rank-1 geometric factor) detection, done HERE
        # while the f64 factors are alive: G[c, q] = g6[c] * w_q and
        # detJw[c, q] = |detJ[c]| * w_q exactly for parallelepiped
        # cells. The f32 stored copies fail any meaningful rank-1 test
        # by their own rounding (bit round 3), and recomputing f64
        # geometry later costs a full second pass (~40 s at 64^3).
        af = None
        if tab.collocated:
            w3 = geometry.quadrature_weights_3d(tab).astype(np.float64)
            nd = nq1**3
            dJ64 = np.asarray(detJw, np.float64).reshape(nc, nd)
            G64 = np.asarray(G, np.float64).reshape(nc, nd, 3, 3)
            sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            Gs = np.stack([G64[:, :, a, b] for a, b in sym])
            g6 = Gs[:, :, :1] / w3[0]
            dJ = dJ64[:, :1] / w3[0]
            gs_scale = max(float(np.abs(Gs).max()), 1e-300)
            dj_scale = max(float(np.abs(dJ64).max()), 1e-300)
            if (
                np.abs(Gs - g6 * w3).max() <= 1e-12 * gs_scale
                and np.abs(dJ64 - dJ * w3).max() <= 1e-12 * dj_scale
            ):
                af = {"g6": g6[..., 0], "dJ": dJ[..., 0]}
        object.__setattr__(self, "_affine_small", af)
        object.__setattr__(
            self, "_G", G.reshape(nc, nq1, nq1, nq1, 3, 3).astype(npdt)
        )
        object.__setattr__(self, "_dofmap", self.dofs.dofmap)

    @property
    def ndofs(self) -> int:
        return self.dofs.ndofs

    def gather(self, x: jax.Array) -> jax.Array:
        m = self.dofs.p + 1
        xe = gs.gather_indexed(x, self._dofmap)
        return xe.reshape(-1, m, m, m)

    @cached_property
    def _ell(self) -> gs.EllScatter:
        return gs.build_ell_scatter(self._dofmap, self.ndofs)

    def scatter(self, ye: jax.Array) -> jax.Array:
        """Element->dof scatter-add. Default: the ELL transpose-gather
        formulation (TPU-friendly — no indexed scatter on the hot path);
        ``scatter_mode='sorted'`` keeps the XLA sorted-scatter baseline."""
        if self.scatter_mode == "sorted":
            nc = ye.shape[0]
            return gs.scatter_indexed(
                ye.reshape(nc, -1), self._dofmap, self.ndofs
            )
        return gs.scatter_ell(ye, self._ell)

    def mass(self, x: jax.Array) -> jax.Array:
        """y = M x — general sum-factorized B^T diag(detJw) B per element
        (mass_apply semantics, common/cuda/mass_kernel.cu:4-46).

        Collocated quadrature makes B the identity, so on TPU this
        dispatches to the fused windowed kernel (same operator as the
        spectral roundtrip)."""
        import os

        if (
            jax.default_backend() == "tpu"
            and not os.environ.get("WAVE_FENICS_TPU_NO_PALLAS")
            and self._fused_tables is not None
        ):
            if self._tab.collocated:
                return self.spectral_mass_fused(x)
            if self._gauss_fused_ok:
                return self.mass_gauss_fused(x)
        return self.mass_indexed(x)

    def mass_indexed(self, x: jax.Array) -> jax.Array:
        """XLA indexed baseline of :meth:`mass` — gather -> per-element
        B^T diag(detJw) B -> scatter, any quadrature rule. Pinned for
        benches/oracles regardless of backend dispatch."""
        return self.scatter(ek.mass_element(self.gather(x), self._B, self._detJw))

    def spectral_mass(self, x: jax.Array) -> jax.Array:
        """y = M x for the collocated (diagonal) mass: one multiply by the
        assembled diagonal (see StructuredOperators.spectral_mass)."""
        assert self._tab.collocated
        return jnp.asarray(self.lumped_mass) * x

    def spectral_mass_roundtrip(self, x: jax.Array) -> jax.Array:
        """Reference-shaped gather -> detJw -> scatter path
        (spectral_mass.hpp:84-89); requires collocated quadrature."""
        assert self._tab.collocated
        return self.scatter(ek.spectral_mass_element(self.gather(x), self._detJw))

    @cached_property
    def lumped_mass(self) -> np.ndarray:
        """m = M @ 1 via NumPy (host precompute; trace-safe constant)."""
        m1 = self.dofs.p + 1
        nc = self.mesh.ncells
        ones = np.ones((nc, m1, m1, m1), dtype=np.dtype(self.dtype))
        uq = np.einsum("qi,cijk->cqjk", self._B, ones)
        uq = np.einsum("qj,cijk->ciqk", self._B, uq)
        uq = np.einsum("qk,cijk->cijq", self._B, uq) * self._detJw
        ye = np.einsum("qi,cqjk->cijk", self._B, uq)
        ye = np.einsum("qj,ciqk->cijk", self._B, ye)
        ye = np.einsum("qk,cijq->cijk", self._B, ye)
        out = np.zeros((self.ndofs,), dtype=np.dtype(self.dtype))
        np.add.at(out, self._dofmap.ravel(), ye.reshape(nc, -1).ravel())
        return out

    def stiffness(self, x: jax.Array, c0: float | jax.Array = 1.0) -> jax.Array:
        """y = -c0^2 K x with full G (skernel semantics,
        common/operators.hpp:112-133).

        On TPU with collocated quadrature and p <= 4, dispatches to the
        fused windowed Pallas kernel (ops.pallas_general — the TPU-native
        answer to the fused CUDA operators, common/cuda/mass.hpp:74-95);
        cells the window/chain tables cannot host are applied by this XLA
        path and added (``_spill_*``)."""
        import os

        static_c0 = isinstance(c0, (int, float))
        if (
            static_c0
            and jax.default_backend() == "tpu"
            and not os.environ.get("WAVE_FENICS_TPU_NO_PALLAS")
            and self._fused_tables is not None
        ):
            if self._tab.collocated:
                return self.stiffness_fused(x, c0)
            if self._gauss_fused_ok:
                return self.stiffness_gauss_fused(x, c0)
        return self.stiffness_indexed(x, c0)

    @property
    def _gauss_fused_ok(self) -> bool:
        """Whether the non-collocated (Gauss-rule) forms can run fused:
        single-row cells need the per-cell qpoints in <= 2 lane tiles
        (all of p=1..4 at q=2p); split-row cells (p=5/6, rpc=2/3) allow
        up to 4 full-lane q-tiles (p=5: 216 qpts -> T=2; p=6: 343 ->
        T=3)."""
        tb = self._fused_tables
        nq3 = self._tab.nq ** 3
        if tb.rpc == 1:
            return nq3 <= 2 * (128 // tb.cpr)
        return nq3 <= 4 * 128

    def stiffness_indexed(
        self, x: jax.Array, c0: float | jax.Array = 1.0
    ) -> jax.Array:
        """XLA indexed path (gather -> element contraction -> scatter);
        the cross-implementation oracle for the fused kernel."""
        coeff = -jnp.asarray(c0, dtype=self.dtype) ** 2
        ye = ek.stiffness_element_full(
            self.gather(x), self._B, self._D, self._G, coeff
        )
        return self.scatter(ye)

    # -- fused windowed kernel path (TPU) --------------------------------

    @cached_property
    def _fused_tables(self):
        """Window/chain tables for the fused kernel, or None when the
        mesh/degree cannot use it (p > 6, or a dof numbering so
        non-local that most cells spill). p == 5/6 cells (nd > 127
        lanes) pack as rpc = 2/3 split-block rows (general_tables).
        The tables depend only on the dofmap — quadrature-specific
        gating lives at each dispatch."""
        if (self.dofs.p + 1) ** 3 > 3 * 128:
            self._warn_indexed_fallback(
                f"degree p={self.dofs.p} exceeds the fused kernel's "
                f"split-row lane budget (nd={(self.dofs.p + 1) ** 3} > "
                "384)"
            )
            return None
        from .general_tables import build_batch_tables

        nc = self.mesh.ncells
        best = None
        import os

        # experiment knobs: pin the window config / batch size
        # (WAVE_FENICS_GENERAL_HE="H,E", _BATCH_CELLS=N) — used by the
        # on-chip config A/Bs (experiments/exp_round4_numbering.py)
        he = os.environ.get("WAVE_FENICS_GENERAL_HE")
        bc = os.environ.get("WAVE_FENICS_GENERAL_BATCH_CELLS")
        bc = int(bc) if bc else None
        if he:
            H, E = (int(v) for v in he.split(","))
            configs = ((H, E),)
        else:
            # contiguous windows first (cheapest DMA), then 4-extent
            # windows — those cover batches at ANY mesh size (contiguous
            # spans grow ~N^(2/3), docs/BENCH_NOTES.md round 3). The
            # H=128 multi-extent fast path is A/B'd on chip via the env
            # knob (experiments/exp_round4_batch.py) before any default
            # change: its op count is lower but its batch count is
            # higher, and per-batch MXU work is fixed.
            configs = ((128, 1), (256, 1), (256, 4))
        for H, E in configs:
            tb = build_batch_tables(self._dofmap, self.ndofs, tile_h=H,
                                    extents=E, max_spill_frac=0.5,
                                    batch_cells=bc)
            if best is None or len(tb.spill_cells) < len(
                best.spill_cells
            ):
                best = tb
            if len(tb.spill_cells) <= 0.02 * nc:
                break
        if len(best.spill_cells) > 0.5 * nc:
            self._warn_indexed_fallback(
                f"{len(best.spill_cells)}/{nc} cells spill the window/"
                "chain tables (dof numbering too non-local)"
            )
            return None  # numbering defeats the windows; stay on XLA
        return best

    @staticmethod
    def _warn_indexed_fallback(reason: str) -> None:
        """Loud cliff warning: the XLA indexed path is ~50x slower than
        the fused windowed kernel on TPU (measured ~0.02 vs ~1 GDoF/s at
        p=4, docs/BENCH_NOTES.md). The reference simply throws beyond its
        kernel's coverage (common/cuda/mass.hpp:80-93); we keep running,
        but the user must know the cliff is under them."""
        import warnings

        if jax.default_backend() == "tpu":
            warnings.warn(
                f"GeneralOperators: {reason}; falling back to the XLA "
                "indexed gather/scatter path (~50x slower than the fused "
                "windowed kernel on TPU)",
                RuntimeWarning,
                stacklevel=3,
            )

    @cached_property
    def _fused_geo(self):
        """Packed geometric factors: (detJw [1, ...], G-sym [6, ...]).
        Collocated only — per-cell factor count must equal nd."""
        from .general_tables import pack_cell_values

        assert self._tab.collocated
        tb = self._fused_tables
        nc = self.mesh.ncells
        nd = (self.dofs.p + 1) ** 3
        detJw = np.asarray(self._detJw).reshape(nc, nd)
        G = np.asarray(self._G).reshape(nc, nd, 3, 3)
        sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        Gp = np.stack([G[:, :, a, b] for a, b in sym])
        npdt = np.dtype(self.dtype)
        return (
            pack_cell_values(tb, detJw[None], npdt),
            pack_cell_values(tb, Gp, npdt),
        )

    @cached_property
    def _fused_affine(self):
        """Rank-1 geometric factors for affine (parallelepiped) cells.

        With a constant Jacobian, G[c, q] = g6[c] * w_q and
        detJw[c, q] = |detJ[c]| * w_q EXACTLY — the kernel then streams
        6 floats per CELL instead of 6 per node (the dominant DMA term
        of the fused stiffness at scale: ~100 MB -> ~1 MB at 32^3).
        Detected post-clamp at 1e-12 relative, so engaging the path
        never changes results beyond that; curved meshes return None
        and keep the full per-node factors. The reference always
        streams full per-qpoint factors (common/precompute.hpp:148-176)
        — this specialization is free accuracy-preserving bandwidth on
        the (very common) affine-cell meshes.

        Default: engaged at cpr == 1 (p >= 4) and at p == 1. At p=2/3
        the packed-row form's in-kernel 0/1 selector matmul costs more
        than the geo-DMA it saves: the round-5 one-session A/B measured
        per-node stiffness 10-15% FASTER (p=2: 0.735 vs 0.669, p=3:
        1.010 vs 0.880 GDoF/s at 32^3; mass within 3% either way —
        experiments/logs/r5_batch.json 'p23-affine-ab'). At p=1
        (cpr=16, nd=8) the balance flips back: the geo-DMA saved is
        16x per row and affine wins both ops (mass 0.330 vs 0.271,
        stiffness 0.258 vs 0.234 GDoF/s at 32^3 —
        experiments/logs/r5b_bisect.json 'p1-affine-ab').
        WAVE_FENICS_TPU_AFFINE=1 forces it on, _NO_AFFINE disables."""
        import os

        tb = self._fused_tables
        af = self._affine_small
        if (tb is None or tb.rpc != 1 or af is None
                or not self._tab.collocated
                or os.environ.get("WAVE_FENICS_TPU_NO_AFFINE")):
            return None
        if (tb.cpr != 1 and self.dofs.p != 1
                and not os.environ.get("WAVE_FENICS_TPU_AFFINE")):
            return None
        g6, dJ = af["g6"], af["dJ"]  # [6, nc], [nc] — detected at init
        npdt = np.dtype(self.dtype)
        nb, cpr = tb.nbatch, tb.cpr
        # kernel layout [ngeo, nbatch, 128, ac8]: minor lane g holds the
        # constant of the cell packed at lane block g of that row
        # (pallas_general.make_general_apply affine form)
        ac8 = max(8, -(-cpr // 8) * 8)
        geo6 = np.zeros((6, nb, 128, ac8), npdt)
        m1 = np.zeros((1, nb, 128, ac8), npdt)
        bc = tb.batch_cells
        for i in range(nb):
            slots = np.nonzero(bc[i] >= 0)[0]
            cells = bc[i, slots]
            geo6[:, i, slots // cpr, slots % cpr] = g6[:, cells]
            m1[0, i, slots // cpr, slots % cpr] = dJ[cells]
        return {"g6": geo6, "m1": m1}

    @cached_property
    def _fused_cache(self) -> dict:
        return {}

    @cached_property
    def _fused_merge(self):
        """Scatter-merge tables (element-space claim pre-reduction):
        cuts the in-kernel scatter from ~max-multiplicity chains to
        log2 merge rounds + 1-2 residual chains."""
        from .general_tables import build_scatter_merge

        return build_scatter_merge(self._fused_tables)

    def _fused_apply(self, op: str, coeff: float):
        from .pallas_general import make_general_apply

        key = (op, float(coeff))
        fn = self._fused_cache.get(key)
        if fn is None:
            tb = self._fused_tables
            af = self._fused_affine
            Bq = None
            if op == "mass_gauss":
                # non-collocated quadrature: q-space detJw tiles + the
                # 3D interpolation kron (demo/gpu_operator pipeline)
                from .general_tables import pack_cell_qvalues

                nc = self.mesh.ncells
                djq = np.asarray(self._detJw, np.float64).reshape(nc, -1)
                Bq = np.kron(np.kron(self._B, self._B), self._B)
                T = -(-Bq.shape[0] // (128 // tb.cpr))
                geo = pack_cell_qvalues(tb, djq, T,
                                        dtype=np.dtype(self.dtype))
                wq = None
            elif op == "stiffness_gauss":
                # 6 symmetric G entries at qpoints (gi*T + t tiles) +
                # the 3 axis-derivative interpolation krons
                from .general_tables import pack_cell_qvalues

                nc = self.mesh.ncells
                nq3 = self._tab.nq ** 3
                B1, D1 = self._B, self._D
                Bq = (
                    np.kron(np.kron(D1, B1), B1),  # d/dx (i slowest)
                    np.kron(np.kron(B1, D1), B1),  # d/dy
                    np.kron(B1, np.kron(B1, D1)),  # d/dz (k fastest)
                )
                T = -(-nq3 // (128 // tb.cpr))
                G = np.asarray(self._G, np.float64).reshape(
                    nc, nq3, 3, 3
                )
                sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
                geo = np.concatenate(
                    [pack_cell_qvalues(tb, G[:, :, a, b], T,
                                       dtype=np.dtype(self.dtype))
                     for a, b in sym]
                )
                wq = None
            elif af is not None:
                geo = af["m1"] if op == "mass" else af["g6"]
                wq = geometry.quadrature_weights_3d(self._tab)
            else:
                geo_m, geo_s = self._fused_geo
                geo = geo_m if op == "mass" else geo_s
                wq = None
            fn = make_general_apply(
                tb, geo, op,
                D1=self._D if op == "stiffness" else None,
                coeff=coeff, p=self.dofs.p, dtype=self.dtype,
                merge=self._fused_merge, affine_w=wq,
                resident=self.fused_resident or None, Bq=Bq,
            )
            self._fused_cache[key] = fn
        return fn

    def _spill_stiffness(self, x: jax.Array, coeff) -> jax.Array:
        cells = self._fused_tables.spill_cells
        m = self.dofs.p + 1
        dmap = self._dofmap[cells]
        xe = gs.gather_indexed(x, dmap).reshape(-1, m, m, m)
        ye = ek.stiffness_element_full(
            xe, self._B, self._D, self._G[cells], coeff
        )
        return gs.scatter_indexed(
            ye.reshape(len(cells), -1), dmap, self.ndofs
        )

    def _spill_mass(self, x: jax.Array) -> jax.Array:
        cells = self._fused_tables.spill_cells
        m = self.dofs.p + 1
        dmap = self._dofmap[cells]
        xe = gs.gather_indexed(x, dmap).reshape(-1, m, m, m)
        if self._tab.collocated:
            ye = ek.spectral_mass_element(xe, self._detJw[cells])
        else:
            ye = ek.mass_element(xe, self._B, self._detJw[cells])
        return gs.scatter_indexed(
            ye.reshape(len(cells), -1), dmap, self.ndofs
        )

    def stiffness_fused(self, x: jax.Array, c0: float = 1.0) -> jax.Array:
        """Fused windowed-kernel stiffness matvec (+ XLA spill subset)."""
        coeff = -float(c0) ** 2
        y = self._fused_apply("stiffness", coeff)(x)
        if len(self._fused_tables.spill_cells):
            y = y + self._spill_stiffness(x, coeff)
        return y

    def spectral_mass_fused(self, x: jax.Array) -> jax.Array:
        """Fused gather -> detJw -> scatter mass (the reference's
        spectral_mass.hpp:84-89 data-movement shape at device speed)."""
        y = self._fused_apply("mass", 1.0)(x)
        if len(self._fused_tables.spill_cells):
            y = y + self._spill_mass(x)
        return y

    def stiffness_gauss_fused(
        self, x: jax.Array, c0: float = 1.0
    ) -> jax.Array:
        """Fused NON-collocated full-G stiffness: the skernel sum
        (common/operators.hpp:112-133) at Gauss points in one window
        pass — 3 derivative-interpolation q-tile families + 6 symmetric
        G q-tile entries. Covers any quadrature whose per-cell qpoints
        fit <= 2 lane tiles."""
        coeff = -float(c0) ** 2
        y = self._fused_apply("stiffness_gauss", coeff)(x)
        if len(self._fused_tables.spill_cells):
            y = y + self._spill_stiffness(x, coeff)
        return y

    def mass_gauss_fused(self, x: jax.Array) -> jax.Array:
        """Fused NON-collocated mass: gather -> B^T diag(detJw) B at
        Gauss points -> scatter in one window pass (the decomposed
        gpu_operator pipeline, demo/gpu_operator/main.cpp:144-160, as a
        single fused kernel). Covers any quadrature whose per-cell
        qpoints fit <= 2 lane tiles."""
        y = self._fused_apply("mass_gauss", 1.0)(x)
        if len(self._fused_tables.spill_cells):
            y = y + self._spill_mass(x)
        return y

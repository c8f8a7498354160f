"""Fused unstructured-dofmap operator: tables + interpret-mode kernel.

Validation model follows the reference's exact-value scatter tests
(demo/gpu_scatter_local/main.cpp:84-90) plus dense-oracle operator parity:
the window/chain tables must reproduce gather/scatter EXACTLY (they only
move values), and the fused kernel must match the XLA indexed path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import HexMesh, box_mesh
from wave_fenics_tpu.ops.general_tables import (
    build_batch_tables, pack_cell_values, reference_gather,
    reference_scatter,
)
from wave_fenics_tpu.ops.operators import GeneralOperators


def _perturbed_mesh(cells, extent, seed=0, amp=0.02):
    rng = np.random.default_rng(seed)
    hm = box_mesh(cells, extent).to_hex_mesh()
    pts = hm.points.copy()
    inner = np.all(
        (pts > 1e-9) & (pts < np.asarray(extent) - 1e-9), axis=1
    )
    pts[inner] += amp * rng.standard_normal(pts[inner].shape)
    return HexMesh(points=pts, cells=hm.cells)


@pytest.mark.parametrize("p,cells", [(1, (5, 3, 2)), (2, (6, 5, 4)),
                                     (3, (4, 4, 3)), (4, (4, 3, 3)),
                                     (5, (3, 2, 2)), (6, (2, 2, 2))])
def test_tables_gather_scatter_exact(p, cells):
    """Chain tables reproduce gather/scatter bit-exactly (NumPy emulation
    of the in-kernel dynamic-gather sequence)."""
    rng = np.random.default_rng(1)
    hm = box_mesh(cells, (1.0, 1.0, 1.0)).to_hex_mesh()
    dm = build_dofmap(hm, p)
    nd = (p + 1) ** 3
    tb = build_batch_tables(dm.dofmap, dm.ndofs, tile_h=128)
    x = rng.standard_normal(dm.ndofs)
    xe = reference_gather(tb, x)
    covered = np.zeros(hm.ncells, bool)
    for i in range(tb.nbatch):
        for b, cell in enumerate(tb.batch_cells[i]):
            if cell < 0:
                continue
            covered[cell] = True
            r_, lo_ = tb.slot_coords(b)
            np.testing.assert_array_equal(
                xe[i, r_, lo_], x[dm.dofmap[cell]]
            )
    assert covered.sum() + len(tb.spill_cells) == hm.ncells
    # scatter: random element values, exact sum
    ye = np.zeros((tb.nbatch, tb.H, 128))
    y_ref = np.zeros(dm.ndofs)
    for i in range(tb.nbatch):
        for b, cell in enumerate(tb.batch_cells[i]):
            if cell < 0:
                continue
            r_, lo_ = tb.slot_coords(b)
            vals = rng.standard_normal(nd)
            ye[i, r_, lo_] = vals
            np.add.at(y_ref, dm.dofmap[cell], vals)
    y = reference_scatter(tb, ye, dm.ndofs)
    np.testing.assert_allclose(y, y_ref, atol=1e-12)


@pytest.mark.parametrize("p", [1, 2, 4, 5, 6])
def test_fused_general_ops_match_indexed(p):
    """Fused windowed kernel (interpret mode) == XLA indexed path on a
    perturbed (genuinely unstructured) mesh, f64. p=5/6 exercise the
    split-row (rpc=2/3) cell packing — nd > 127 lanes."""
    cells = ((2, 2, 2) if p >= 6 else (3, 2, 2) if p >= 5
             else (4, 3, 3) if p >= 3 else (5, 4, 3))
    hm = _perturbed_mesh(cells, (1.0, 0.8, 0.9), seed=p)
    dm = build_dofmap(hm, p)
    ops = GeneralOperators(hm, dm, dtype=jnp.float64)
    assert ops._fused_tables is not None
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(dm.ndofs))
    y_f = ops.stiffness_fused(x, 1500.0)
    y_o = ops.stiffness_indexed(x, 1500.0)
    scale = float(jnp.abs(y_o).max())
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_o),
                               atol=1e-13 * scale)
    m_f = ops.spectral_mass_fused(x)
    m_o = ops.spectral_mass_roundtrip(x)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_o),
                               atol=1e-13 * float(jnp.abs(m_o).max()))


def test_fused_spill_path():
    """Cells that overflow the window/chain budget must flow through the
    XLA spill path and still produce the exact operator."""
    hm = _perturbed_mesh((4, 3, 3), (1.0, 0.8, 0.9), seed=7)
    dm = build_dofmap(hm, 4)
    # tiny chain budget forces spills
    from wave_fenics_tpu.ops import operators as opsmod

    ops = GeneralOperators(hm, dm, dtype=jnp.float64)
    tb = build_batch_tables(dm.dofmap, dm.ndofs, tile_h=128,
                            max_gather_chains=3, max_scatter_chains=5)
    assert len(tb.spill_cells) > 0
    object.__setattr__(ops, "_fused_tables", tb)
    ops.__dict__["_fused_tables"] = tb  # override cached_property
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal(dm.ndofs))
    y_f = ops.stiffness_fused(x, 2.0)
    y_o = ops.stiffness_indexed(x, 2.0)
    scale = float(jnp.abs(y_o).max())
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_o),
                               atol=1e-13 * scale)


def test_first_appearance_numbering_locality():
    """build_dofmap default numbering: consecutive cells touch a narrow
    contiguous id range (what the windows rely on)."""
    hm = box_mesh((8, 8, 8), (1.0, 1.0, 1.0)).to_hex_mesh()
    dm = build_dofmap(hm, 4)
    d = dm.dofmap.astype(np.int64)
    # first cell starts at id 0; spans stay well under one x-plane + slack
    assert d[0].min() == 0
    plane = 8 * 8 * 5 ** 3  # generous bound: one cell-plane of dofs
    spans = d.max(axis=1) - d.min(axis=1)
    assert spans.max() < plane


def test_fused_apply_first_built_inside_jit():
    """Building the fused apply for the first time INSIDE a jit trace must
    not cache tracers (the round-2 padded-model failure class): a second
    jitted call and an eager call must both still work and agree."""
    hm = _perturbed_mesh((3, 3, 2), (1.0, 0.8, 0.9), seed=13)
    dm = build_dofmap(hm, 2)
    ops = GeneralOperators(hm, dm, dtype=jnp.float64)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal(dm.ndofs))
    jf = jax.jit(lambda a: ops.stiffness_fused(a, 2.0))
    y1 = np.asarray(jf(x))          # builds tables inside the trace
    y2 = np.asarray(jf(x + 0.0))    # second jitted call
    y3 = np.asarray(ops.stiffness_fused(x, 2.0))  # eager
    np.testing.assert_allclose(y2, y1, rtol=1e-14)
    np.testing.assert_allclose(y3, y1, rtol=1e-14)


def test_general_stiffness_dispatch_uses_oracle_off_tpu():
    """On CPU the public stiffness() stays on the indexed path (fused is
    TPU-only at runtime) and matches stiffness_indexed."""
    hm = _perturbed_mesh((3, 3, 2), (1.0, 0.8, 0.9), seed=9)
    dm = build_dofmap(hm, 2)
    ops = GeneralOperators(hm, dm, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(dm.ndofs))
    np.testing.assert_allclose(
        np.asarray(ops.stiffness(x, 3.0)),
        np.asarray(ops.stiffness_indexed(x, 3.0)),
        rtol=1e-14,
    )


@pytest.mark.parametrize("p,cells", [(2, (6, 5, 4)), (4, (4, 3, 3))])
def test_scatter_merge_exact(p, cells):
    """Element-space claim pre-reduction (merge rounds + residual
    chains) must reproduce the plain chain scatter exactly — it only
    reassociates the same additions (deterministic fixed order)."""
    from wave_fenics_tpu.ops.general_tables import (
        build_scatter_merge, reference_merge_scatter,
    )

    hm = _perturbed_mesh(cells, (1.0, 1.0, 1.0), seed=p)
    dofs = build_dofmap(hm, p)
    tb = build_batch_tables(
        np.asarray(dofs.dofmap, np.int64), dofs.ndofs
    )
    mg = build_scatter_merge(tb)
    assert mg is not None and mg.ks < tb.ks
    rng = np.random.default_rng(1)
    ye = rng.standard_normal((tb.nbatch, tb.H, 128))
    # lane 127 is REAL data under full-lane packing (the scatter
    # sentinel is masked, not a reserved lane); only rows >= R are zero
    ye[:, tb.R :, :] = 0.0
    y_chain = reference_scatter(tb, ye, dofs.ndofs)
    y_merge = reference_merge_scatter(tb, mg, ye, dofs.ndofs)
    np.testing.assert_allclose(y_merge, y_chain, rtol=1e-13,
                               atol=1e-13 * np.abs(y_chain).max())


@pytest.mark.parametrize("E,H", [(2, 256), (4, 256)])
def test_multi_extent_windows_exact(E, H):
    """Multi-extent windows (E disjoint He-row DMA extents per batch)
    must reproduce the contiguous-window operator exactly — they are the
    mesh-size-robust window form (contiguous spans grow ~N^(2/3) and
    stop fitting beyond ~16^3 cells; 4x64-row extents cover Morton
    batches at any size)."""
    from wave_fenics_tpu.ops.general_tables import build_scatter_merge
    from wave_fenics_tpu.ops.pallas_general import make_general_apply

    p = 4
    hm = _perturbed_mesh((5, 4, 4), (1.0, 1.0, 1.0), seed=E)
    dofs = build_dofmap(hm, p)
    ops = GeneralOperators(hm, dofs, dtype=jnp.float64)
    dm = np.asarray(dofs.dofmap, np.int64)
    tb = build_batch_tables(dm, dofs.ndofs, tile_h=H, extents=E)
    assert tb.extents == E and len(tb.spill_cells) == 0
    # extents of one batch must be disjoint (RMW write-back safety)
    for i in range(tb.nbatch):
        st = np.sort(tb.start_rows[i])
        assert (np.diff(st) >= tb.He).all()
    nd = (p + 1) ** 3
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    G = np.asarray(ops._G).reshape(hm.ncells, nd, 3, 3)
    geo = pack_cell_values(
        tb, np.stack([G[:, :, a, b] for a, b in sym]), np.float64
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.ndofs))
    o = np.asarray(ops.stiffness_indexed(x, 1.0))
    for merge in (None, build_scatter_merge(tb)):
        y = make_general_apply(tb, geo, "stiffness", D1=ops._D,
                               coeff=-1.0, p=p, dtype=jnp.float64,
                               merge=merge)(x)
        np.testing.assert_allclose(np.asarray(y), o, rtol=1e-13,
                                   atol=1e-13 * np.abs(o).max())


@pytest.mark.parametrize("H,E", [(256, 1), (256, 4)])
def test_gather_overflow_exact(H, E):
    """Per-entry overflow re-encoding of gather chains >= 2 (dense-table
    tail -> 1 KB/slot quadruple lists + one-hot MXU landing) must
    reproduce the full-chain operator exactly."""
    from wave_fenics_tpu.ops.general_tables import (
        build_gather_overflow, build_scatter_merge,
    )
    from wave_fenics_tpu.ops.pallas_general import make_general_apply

    p = 4
    hm = box_mesh((8, 4, 4), (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hm, p)
    ops = GeneralOperators(hm, dofs, dtype=jnp.float64)
    dm = np.asarray(dofs.dofmap, np.int64)
    tb = build_batch_tables(dm, dofs.ndofs, tile_h=H, extents=E)
    assert tb.kg > 2 and len(tb.spill_cells) == 0
    assert build_gather_overflow(tb, max_slots=4) is None  # tail > 512
    ov = build_gather_overflow(tb, max_slots=16)
    assert ov is not None and ov.keep == 2
    nd = (p + 1) ** 3
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    G = np.asarray(ops._G).reshape(hm.ncells, nd, 3, 3)
    geo = pack_cell_values(
        tb, np.stack([G[:, :, a, b] for a, b in sym]), np.float64
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.ndofs))
    o = np.asarray(ops.stiffness_indexed(x, 1.0))
    y = make_general_apply(tb, geo, "stiffness", D1=ops._D, coeff=-1.0,
                           p=p, dtype=jnp.float64,
                           merge=build_scatter_merge(tb),
                           overflow=16)(x)
    np.testing.assert_allclose(np.asarray(y), o, rtol=1e-13,
                               atol=1e-13 * np.abs(o).max())
    # dense-chain path unchanged (overflow disabled)
    y2 = make_general_apply(tb, geo, "stiffness", D1=ops._D, coeff=-1.0,
                            p=p, dtype=jnp.float64, overflow=False)(x)
    np.testing.assert_allclose(np.asarray(y2), o, rtol=1e-13,
                               atol=1e-13 * np.abs(o).max())


def test_affine_rank1_geometry_exact():
    """Affine (parallelepiped) cells: G[c,q] = g6[c]*w_q exactly, so the
    fused kernel streams 6 floats per cell instead of per node. Must be
    exact on sheared (non-axis-aligned) parallelepiped meshes and must
    NOT engage on curved meshes."""
    from wave_fenics_tpu.core.mesh import HexMesh
    from wave_fenics_tpu.ops import element_kernels as ek

    bm = box_mesh((5, 4, 4), (1.0, 1.0, 1.0)).to_hex_mesh()
    A = np.array([[1.0, 0.3, 0.1], [0.0, 0.9, 0.2], [0.0, 0.0, 1.1]])
    sheared = HexMesh(points=bm.points @ A.T, cells=bm.cells)
    rng = np.random.default_rng(0)
    # p=4: cpr=1 (lane-0 broadcast, affine DEFAULT-ON); p=2: cpr=4 and
    # p=1: cpr=16 — the packed-block form with the static selector
    # expansion, default-OFF since round 5 (per-node stiffness measured
    # 10-15% faster on chip; r5_batch 'p23-affine-ab') and forced on
    # here via WAVE_FENICS_TPU_AFFINE for exactness coverage
    import os

    os.environ.pop("WAVE_FENICS_TPU_AFFINE", None)
    dofs2 = build_dofmap(sheared, 2)
    assert GeneralOperators(
        sheared, dofs2, dtype=jnp.float64
    )._fused_affine is None  # the new cpr>1 default
    for hm, p, expect_affine in ((sheared, 4, True), (sheared, 2, True),
                                 (sheared, 1, True),
                                 (_perturbed_mesh((5, 4, 4), (1, 1, 1),
                                                  seed=3), 4, False)):
        if p < 4:
            os.environ["WAVE_FENICS_TPU_AFFINE"] = "1"
        dofs = build_dofmap(hm, p)
        try:
            ops = GeneralOperators(hm, dofs, dtype=jnp.float64)
            assert (ops._fused_affine is not None) == expect_affine
        finally:
            os.environ.pop("WAVE_FENICS_TPU_AFFINE", None)
        if expect_affine and p < 4:
            assert ops._fused_tables.cpr > 1
        x = jnp.asarray(rng.standard_normal(dofs.ndofs))
        o = np.asarray(ops.stiffness_indexed(x, 1.0))
        y = np.asarray(ops._fused_apply("stiffness", -1.0)(x))
        np.testing.assert_allclose(y, o, rtol=1e-13,
                                   atol=1e-13 * np.abs(o).max())
        ye = ek.spectral_mass_element(ops.gather(x), ops._detJw)
        om = np.asarray(ops.scatter(ye))
        ym = np.asarray(ops._fused_apply("mass", 1.0)(x))
        np.testing.assert_allclose(ym, om, rtol=1e-13,
                                   atol=1e-13 * np.abs(om).max())


def test_resident_mode_and_coarsening_exact():
    """VMEM-resident kernel variant (whole x + output accumulator in
    VMEM, one inbound DMA, one final flush) and grid coarsening must
    reproduce the windowed operator exactly — including sub-batch
    padding when C does not divide (or exceeds) nbatch."""
    from wave_fenics_tpu.ops.general_tables import build_scatter_merge
    from wave_fenics_tpu.ops.pallas_general import make_general_apply

    p = 4
    hm = _perturbed_mesh((5, 4, 4), (1.0, 1.0, 1.0), seed=11)
    dofs = build_dofmap(hm, p)
    ops = GeneralOperators(hm, dofs, dtype=jnp.float64)
    nd = (p + 1) ** 3
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    G = np.asarray(ops._G).reshape(hm.ncells, nd, 3, 3)
    tb = ops._fused_tables
    geo = pack_cell_values(
        tb, np.stack([G[:, :, a, b] for a, b in sym]), np.float64
    )
    mg = build_scatter_merge(tb)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.ndofs))
    o = np.asarray(ops.stiffness_indexed(x, 1.0))
    tol = 1e-13 * np.abs(o).max()
    for resident in (False, True):
        # C > nbatch exercises whole padded sub-batches
        for C in (1, 3, tb.nbatch + 2):
            y = make_general_apply(
                tb, geo, "stiffness", D1=ops._D, coeff=-1.0, p=p,
                dtype=jnp.float64, merge=mg, coarsen=C,
                resident=resident,
            )(x)
            np.testing.assert_allclose(np.asarray(y), o, rtol=1e-13,
                                       atol=tol)


@pytest.mark.parametrize("p,cells", [(1, (5, 3, 2)), (2, (4, 3, 3)),
                                     (3, (3, 3, 2)), (4, (3, 2, 2)),
                                     (5, (2, 2, 2)), (6, (2, 2, 1))])
def test_fused_gauss_mass_matches_indexed(p, cells):
    """Non-collocated (Gauss-rule) mass — the decomposed B^T diag(detJw)
    B pipeline of demo/gpu_operator/main.cpp:144-160 — fused into the
    window kernel must match the XLA indexed path at f64."""
    from wave_fenics_tpu.ops import element_kernels as ek
    from wave_fenics_tpu.ops.general_tables import pack_cell_qvalues
    from wave_fenics_tpu.ops.pallas_general import interpolation_tiles

    hm = _perturbed_mesh(cells, (1.0, 1.0, 1.0), seed=p)
    dofs = build_dofmap(hm, p)
    ops = GeneralOperators(hm, dofs, dtype=jnp.float64, rule="gauss")
    assert not ops._tab.collocated
    assert ops._fused_tables is not None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dofs.ndofs))
    o = np.asarray(
        ops.scatter(ek.mass_element(ops.gather(x), ops._B, ops._detJw))
    )
    y = np.asarray(ops.mass_gauss_fused(x))
    np.testing.assert_allclose(y, o, rtol=1e-13,
                               atol=1e-13 * np.abs(o).max())
    # tile layout invariants: q-tiles and B-tiles agree in count
    # (split-row cells carry rpc input-half tiles per q-tile)
    tb = ops._fused_tables
    Bq = np.kron(np.kron(ops._B, ops._B), ops._B)
    tiles = interpolation_tiles(tb.cpr, tb.nd, Bq, rpc=tb.rpc,
                                npl=tb.npl)
    djq = np.asarray(ops._detJw, np.float64).reshape(hm.ncells, -1)
    geo = pack_cell_qvalues(tb, djq, tiles.shape[0] // tb.rpc)
    assert tiles.shape[0] == geo.shape[0] * tb.rpc


@pytest.mark.parametrize("p,cells", [(1, (5, 3, 2)), (2, (4, 3, 3)),
                                     (3, (3, 3, 2)), (4, (3, 2, 2)),
                                     (5, (2, 2, 2)), (6, (2, 2, 1))])
def test_fused_gauss_stiffness_matches_indexed(p, cells):
    """Non-collocated (Gauss-rule) full-G stiffness — the skernel sum of
    common/operators.hpp:112-133 at Gauss points — fused into the window
    kernel must match the XLA indexed path at f64."""
    hm = _perturbed_mesh(cells, (1.0, 1.0, 1.0), seed=10 + p)
    dofs = build_dofmap(hm, p)
    ops = GeneralOperators(hm, dofs, dtype=jnp.float64, rule="gauss")
    assert not ops._tab.collocated
    assert ops._fused_tables is not None
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(dofs.ndofs))
    o = np.asarray(ops.stiffness_indexed(x, 1500.0))
    y = np.asarray(ops.stiffness_gauss_fused(x, 1500.0))
    np.testing.assert_allclose(y, o, rtol=1e-12,
                               atol=1e-12 * np.abs(o).max())
    # annihilates constants (pure Neumann stiffness)
    ones = jnp.ones((dofs.ndofs,), dtype=jnp.float64)
    z = np.asarray(ops.stiffness_gauss_fused(ones, 1.0))
    assert np.abs(z).max() < 1e-9 * np.abs(o).max()


def test_build_tables_early_abandon():
    """max_spill_frac abandons infeasible window configs early, returning
    every remaining cell as spill (and caching nothing)."""
    hm = box_mesh((20, 20, 20), (1.0, 1.0, 1.0)).to_hex_mesh()
    dm = build_dofmap(hm, 4)
    import os
    os.environ["WAVE_FENICS_TABLE_CACHE"] = "off"
    try:
        # contiguous window at 20^3 is infeasible (spans ~N^(2/3))
        tb = build_batch_tables(dm.dofmap, dm.ndofs, tile_h=128,
                                extents=1, max_spill_frac=0.5)
    finally:
        del os.environ["WAVE_FENICS_TABLE_CACHE"]
    assert len(tb.spill_cells) > 0.5 * hm.ncells
    # spill + kept slots still cover every cell exactly once
    kept = set()
    for i in range(tb.nbatch):
        kept.update(int(c) for c in tb.batch_cells[i] if c >= 0)
    assert kept.isdisjoint(tb.spill_cells.tolist())
    assert len(kept) + len(tb.spill_cells) == hm.ncells

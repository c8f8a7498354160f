"""Golden-value and property tests for the 1D GLL basis/quadrature layer.

Formalizes the verification strategy of the reference (SURVEY.md §4):
replaces Basix as the tabulation oracle with analytic golden values.
"""

import numpy as np
import pytest

from wave_fenics_tpu.core import basis


def test_gll_points_weights_golden():
    # n=2 on [0,1]: trapezoid
    pts, wts = basis.gll_points_weights(2)
    np.testing.assert_allclose(pts, [0.0, 1.0], atol=1e-15)
    np.testing.assert_allclose(wts, [0.5, 0.5], atol=1e-15)
    # n=3: Simpson
    pts, wts = basis.gll_points_weights(3)
    np.testing.assert_allclose(pts, [0.0, 0.5, 1.0], atol=1e-15)
    np.testing.assert_allclose(wts, [1 / 6, 4 / 6, 1 / 6], atol=1e-15)
    # n=4: interior points (1 -+ 1/sqrt(5))/2, weights 1/12, 5/12
    pts, wts = basis.gll_points_weights(4)
    s = 1 / np.sqrt(5)
    np.testing.assert_allclose(
        pts, [0.0, (1 - s) / 2, (1 + s) / 2, 1.0], atol=1e-14
    )
    np.testing.assert_allclose(wts, [1 / 12, 5 / 12, 5 / 12, 1 / 12], atol=1e-14)


@pytest.mark.parametrize("n", range(2, 20))
def test_gll_exactness(n):
    """n-point GLL integrates polynomials up to degree 2n-3 exactly."""
    pts, wts = basis.gll_points_weights(n)
    for d in range(2 * n - 2):
        exact = 1.0 / (d + 1)
        np.testing.assert_allclose(
            np.sum(wts * pts**d), exact, rtol=1e-12, err_msg=f"n={n} deg={d}"
        )


@pytest.mark.parametrize("n", range(1, 12))
def test_gauss_exactness(n):
    pts, wts = basis.gauss_points_weights(n)
    for d in range(2 * n):
        np.testing.assert_allclose(np.sum(wts * pts**d), 1.0 / (d + 1), rtol=1e-12)


def test_qdegree_map():
    # common/operators.hpp:63-72
    assert [basis.qdegree(p) for p in range(2, 11)] == [3, 4, 6, 8, 10, 12, 14, 16, 18]


@pytest.mark.parametrize("p", range(1, 9))
def test_collocation(p):
    """The reference q(p) map makes quadrature points == basis nodes, so the
    interpolation matrix is the identity (diagonal mass property)."""
    tab = basis.tabulate_1d(p)
    assert tab.collocated
    assert tab.nq == p + 1
    np.testing.assert_array_equal(tab.B, np.eye(p + 1))


@pytest.mark.parametrize("p", range(1, 9))
def test_lagrange_properties(p):
    tab = basis.tabulate_1d(p, q=2 * p + 2, rule="gauss")
    assert not tab.collocated
    # partition of unity, derivative rows sum to zero
    np.testing.assert_allclose(tab.B.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(tab.D.sum(axis=1), 0.0, atol=1e-10)
    # interpolation reproduces polynomials up to degree p
    for d in range(p + 1):
        np.testing.assert_allclose(
            tab.B @ tab.nodes**d, tab.qpts**d, atol=1e-11
        )
        np.testing.assert_allclose(
            tab.D @ tab.nodes**d,
            d * tab.qpts ** max(d - 1, 0) if d > 0 else np.zeros(tab.nq),
            atol=1e-9,
        )


@pytest.mark.parametrize("p", range(1, 7))
def test_derivative_matrix_collocated(p):
    """Collocated D is the GLL differentiation matrix: D @ nodes^d = d*nodes^(d-1)."""
    tab = basis.tabulate_1d(p)
    for d in range(1, p + 1):
        np.testing.assert_allclose(
            tab.D @ tab.nodes**d, d * tab.nodes ** (d - 1), atol=1e-10
        )


@pytest.mark.parametrize("p", [1, 2, 3, 4, 5])
def test_tp_permutation_bijection(p):
    perm = basis.tensor_product_permutation(p)
    nd = (p + 1) ** 3
    assert perm.shape == (nd,)
    assert sorted(perm.tolist()) == list(range(nd))
    # The 8 cell corners in lexicographic order must map to basix vertex dofs 0..7
    n = p + 1
    corners_lex = [
        i * p + n * (j * p) + n * n * (k * p)
        for (i, j, k) in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0),
                          (0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    ]
    assert [perm[c] for c in corners_lex] == list(range(8))


def test_clamp_table():
    t = np.array([1.0 - 1e-12, -1.0 + 1e-12, 1e-13, 0.5])
    out = basis.clamp_table(t)
    np.testing.assert_array_equal(out[:3], [1.0, -1.0, 0.0])
    assert out[3] == 0.5


# Golden dof-coordinate tables for the basix hexahedron Lagrange layout,
# frozen as literals (reference consumes this layout via
# element.get_tensor_product_representation(), common/operators.hpp:24,
# common/permute.hpp:10-28). The p=2 table is the DefElement / Basix
# documentation listing for Q2 (vertices in basix vertex order, edge
# midpoints in basix edge order, face centres in basix face order,
# cell centre); p=3 additionally freezes the convention details that
# matter for imports: edge interiors run low->high vertex, face interiors
# are lattices with the v0->v1 axis fastest, cell interiors x-fastest.
# Guards hex_basix_to_lex_permutation against regressions.
_BASIX_HEX_GRID_P2 = [
    (0, 0, 0), (2, 0, 0), (0, 2, 0), (2, 2, 0),
    (0, 0, 2), (2, 0, 2), (0, 2, 2), (2, 2, 2),
    (1, 0, 0), (0, 1, 0), (0, 0, 1), (2, 1, 0), (2, 0, 1), (1, 2, 0),
    (0, 2, 1), (2, 2, 1), (1, 0, 2), (0, 1, 2), (2, 1, 2), (1, 2, 2),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (2, 1, 1), (1, 2, 1), (1, 1, 2),
    (1, 1, 1),
]
_BASIX_HEX_GRID_P3 = [
    (0, 0, 0), (3, 0, 0), (0, 3, 0), (3, 3, 0),
    (0, 0, 3), (3, 0, 3), (0, 3, 3), (3, 3, 3),
    (1, 0, 0), (2, 0, 0), (0, 1, 0), (0, 2, 0), (0, 0, 1), (0, 0, 2),
    (3, 1, 0), (3, 2, 0), (3, 0, 1), (3, 0, 2), (1, 3, 0), (2, 3, 0),
    (0, 3, 1), (0, 3, 2), (3, 3, 1), (3, 3, 2), (1, 0, 3), (2, 0, 3),
    (0, 1, 3), (0, 2, 3), (3, 1, 3), (3, 2, 3), (1, 3, 3), (2, 3, 3),
    (1, 1, 0), (2, 1, 0), (1, 2, 0), (2, 2, 0),
    (1, 0, 1), (2, 0, 1), (1, 0, 2), (2, 0, 2),
    (0, 1, 1), (0, 2, 1), (0, 1, 2), (0, 2, 2),
    (3, 1, 1), (3, 2, 1), (3, 1, 2), (3, 2, 2),
    (1, 3, 1), (2, 3, 1), (1, 3, 2), (2, 3, 2),
    (1, 1, 3), (2, 1, 3), (1, 2, 3), (2, 2, 3),
    (1, 1, 1), (2, 1, 1), (1, 2, 1), (2, 2, 1),
    (1, 1, 2), (2, 1, 2), (1, 2, 2), (2, 2, 2),
]


# p=4 — the flagship degree. Frozen from the same documented DefElement /
# Basix layout conventions the p=2/p=3 listings exhibit (vertices, then 12
# edges low->high vertex, then 6 faces with the v0->v1 axis fastest, then
# the x-fastest interior lattice), written out as literals so the imported-
# mesh path at p=4 is pinned against regressions rather than re-derived by
# the code under test.
_BASIX_HEX_GRID_P4 = [
    (0, 0, 0), (4, 0, 0), (0, 4, 0), (4, 4, 0), (0, 0, 4),
    (4, 0, 4), (0, 4, 4), (4, 4, 4), (1, 0, 0), (2, 0, 0),
    (3, 0, 0), (0, 1, 0), (0, 2, 0), (0, 3, 0), (0, 0, 1),
    (0, 0, 2), (0, 0, 3), (4, 1, 0), (4, 2, 0), (4, 3, 0),
    (4, 0, 1), (4, 0, 2), (4, 0, 3), (1, 4, 0), (2, 4, 0),
    (3, 4, 0), (0, 4, 1), (0, 4, 2), (0, 4, 3), (4, 4, 1),
    (4, 4, 2), (4, 4, 3), (1, 0, 4), (2, 0, 4), (3, 0, 4),
    (0, 1, 4), (0, 2, 4), (0, 3, 4), (4, 1, 4), (4, 2, 4),
    (4, 3, 4), (1, 4, 4), (2, 4, 4), (3, 4, 4), (1, 1, 0),
    (2, 1, 0), (3, 1, 0), (1, 2, 0), (2, 2, 0), (3, 2, 0),
    (1, 3, 0), (2, 3, 0), (3, 3, 0), (1, 0, 1), (2, 0, 1),
    (3, 0, 1), (1, 0, 2), (2, 0, 2), (3, 0, 2), (1, 0, 3),
    (2, 0, 3), (3, 0, 3), (0, 1, 1), (0, 2, 1), (0, 3, 1),
    (0, 1, 2), (0, 2, 2), (0, 3, 2), (0, 1, 3), (0, 2, 3),
    (0, 3, 3), (4, 1, 1), (4, 2, 1), (4, 3, 1), (4, 1, 2),
    (4, 2, 2), (4, 3, 2), (4, 1, 3), (4, 2, 3), (4, 3, 3),
    (1, 4, 1), (2, 4, 1), (3, 4, 1), (1, 4, 2), (2, 4, 2),
    (3, 4, 2), (1, 4, 3), (2, 4, 3), (3, 4, 3), (1, 1, 4),
    (2, 1, 4), (3, 1, 4), (1, 2, 4), (2, 2, 4), (3, 2, 4),
    (1, 3, 4), (2, 3, 4), (3, 3, 4), (1, 1, 1), (2, 1, 1),
    (3, 1, 1), (1, 2, 1), (2, 2, 1), (3, 2, 1), (1, 3, 1),
    (2, 3, 1), (3, 3, 1), (1, 1, 2), (2, 1, 2), (3, 1, 2),
    (1, 2, 2), (2, 2, 2), (3, 2, 2), (1, 3, 2), (2, 3, 2),
    (3, 3, 2), (1, 1, 3), (2, 1, 3), (3, 1, 3), (1, 2, 3),
    (2, 2, 3), (3, 2, 3), (1, 3, 3), (2, 3, 3), (3, 3, 3),
]


@pytest.mark.parametrize(
    "p,table",
    [(2, _BASIX_HEX_GRID_P2), (3, _BASIX_HEX_GRID_P3),
     (4, _BASIX_HEX_GRID_P4)],
)
def test_hex_permutation_golden_table(p, table):
    """hex_basix_to_lex_permutation against the frozen basix dof layout."""
    from wave_fenics_tpu.core.basis import hex_basix_to_lex_permutation

    n = p + 1
    perm = hex_basix_to_lex_permutation(p)
    golden = np.empty(n**3, dtype=np.int64)
    for basix_id, (i, j, k) in enumerate(table):
        golden[i + n * j + n * n * k] = basix_id
    np.testing.assert_array_equal(perm, golden)


def test_gauss_default_rule_is_full_rank():
    """rule='gauss' with q=None must give p+1 points (the reference
    demo's own q=2p, demo/gpu_operator/main.cpp:96). The GLL-oriented
    q(p) map under a Gauss rule gives only p points — a rank-deficient
    B and a SINGULAR mass matrix (round-3 bug, found by a CG drive)."""
    from wave_fenics_tpu.core.basis import tabulate_1d

    for p in range(1, 7):
        tab = tabulate_1d(p, None, "gauss")
        assert tab.nq == p + 1, (p, tab.nq)
        assert np.linalg.matrix_rank(tab.B) == p + 1

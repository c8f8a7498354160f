"""NumPy dense-assembly oracles for operator tests.

Plays the role of the reference's CPU oracle operators
(MassOperatorCPU, common/operators.hpp:43-109; --check path of
demo/gpu_operator_monolithic/main.cpp:102-118) — but assembles the full
dense global matrices by direct quadrature, making the check unconditional
rather than a single-vector comparison.
"""

import numpy as np

from wave_fenics_tpu.core import geometry
from wave_fenics_tpu.core.basis import tabulate_1d


def tables_3d(p, q=None, rule="gll"):
    """3D tabulation: Phi[nq, nd], dPhi[3, nq, nd] (z-fastest flattening)."""
    tab = tabulate_1d(p, q, rule)
    B, D = tab.B, tab.D
    Phi = np.einsum("qi,rj,sk->qrsijk", B, B, B)
    nq, nd = tab.nq**3, tab.nd**3
    Phi = Phi.reshape(nq, nd)
    dx = np.einsum("qi,rj,sk->qrsijk", D, B, B).reshape(nq, nd)
    dy = np.einsum("qi,rj,sk->qrsijk", B, D, B).reshape(nq, nd)
    dz = np.einsum("qi,rj,sk->qrsijk", B, B, D).reshape(nq, nd)
    return Phi, np.stack([dx, dy, dz])


def assemble_dense(mesh_hex, dofmap, p, q=None, rule="gll", coeff=1.0):
    """Dense global (M, K): M = sum_c P_c^T Phi^T diag(detJw) Phi P_c,
    K = coeff * sum_c P_c^T [sum_q dphi^T G dphi] P_c."""
    Phi, dPhi = tables_3d(p, q, rule)
    G, detJw = geometry.precompute_geometric_data(mesh_hex, p, q, rule, clamp=False)
    nc = mesh_hex.ncells
    nd = Phi.shape[1]
    ndofs = int(dofmap.max()) + 1
    M = np.zeros((ndofs, ndofs))
    K = np.zeros((ndofs, ndofs))
    for c in range(nc):
        Me = Phi.T @ (detJw[c][:, None] * Phi)
        Ke = np.einsum("dqa,qde,eqb->ab", dPhi, G[c], dPhi, optimize=True)
        idx = dofmap[c]
        M[np.ix_(idx, idx)] += Me
        K[np.ix_(idx, idx)] += coeff * Ke
    return M, K

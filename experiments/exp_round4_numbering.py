"""Round-4 host-side study: cell/dof numbering and window-config A/B for
the fused general kernel (VERDICT r3 item 4: attack the ~8.5 us/batch
chain floor at the numbering level).

The kernel's per-batch cost is dynamic-gather VPU work (the round-3
resident/coarsening sweep refuted DMA and grid-dispatch hypotheses), so
throughput is predicted by a per-batch op count:

  ops/batch ~ 3*Hb*(kg_dense + ks_merged) + n_ov*(Hb + 2) + 2*nr
  (Hb = H/128 [128,128]-gather blocks; each measured ~0.12-0.14 us)

This script builds the window/chain tables at production sizes under
different CELL ORDERINGS (appearance/C-order, morton, RCM on the cell
adjacency graph) and window configs (H, E), reports the table stats and
the op-count prediction, and ranks configs for the on-chip A/B.

Run: python experiments/exp_round4_numbering.py [--size 32] [--degrees 1 3 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def rcm_cell_order(hm) -> np.ndarray:
    """Reverse Cuthill-McKee over the cell face-adjacency graph
    (bandwidth-minimizing; the classic competitor to Morton/C-order)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    nc = hm.ncells
    # face adjacency via shared quad keys
    faces = [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 4, 5), (2, 3, 6, 7),
             (0, 2, 4, 6), (1, 3, 5, 7)]
    keys = {}
    rows, cols = [], []
    for c in range(nc):
        cell = hm.cells[c]
        for f in faces:
            k = tuple(sorted(int(cell[v]) for v in f))
            o = keys.setdefault(k, c)
            if o != c:
                rows += [o, c]
                cols += [c, o]
    g = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(nc, nc))
    return np.asarray(reverse_cuthill_mckee(g.tocsr(), symmetric_mode=True))


def op_count(tb, ovf, mg) -> float:
    """Predicted dynamic-gather ops per apply (relative model)."""
    Hb = tb.H // 128
    kg_d = ovf.keep if ovf is not None else tb.kg
    n_ov = ovf.slots if ovf is not None else 0
    ks = mg.ks if mg is not None else tb.ks
    nr = mg.nrounds if mg is not None else 0
    per_batch = 3 * Hb * (kg_d + ks) + n_ov * (Hb + 2) + 2 * nr
    return per_batch * tb.nbatch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--degrees", type=int, nargs="*", default=[1, 3, 4])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import HexMesh, box_mesh
    from wave_fenics_tpu.ops.general_tables import (
        build_batch_tables, build_gather_overflow, build_scatter_merge,
    )

    n = args.size
    hm = box_mesh((n,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
    orders = {"appearance": None, "morton": "morton"}
    try:
        rcm = rcm_cell_order(hm)
        orders["rcm"] = rcm
    except Exception as e:  # scipy optional
        print(f"# rcm unavailable: {e}", file=sys.stderr)

    results = []
    for p in args.degrees:
        for oname, order in orders.items():
            if oname == "appearance":
                dofs = build_dofmap(hm, p, reorder="appearance")
            elif oname == "morton":
                dofs = build_dofmap(hm, p, reorder="morton")
            else:
                hm_r = HexMesh(points=hm.points, cells=hm.cells[order])
                dofs = build_dofmap(hm_r, p, reorder="appearance")
            for H, E in ((128, 1), (128, 4), (128, 8), (256, 1),
                         (256, 4), (256, 8)):
                try:
                    tb = build_batch_tables(
                        np.asarray(dofs.dofmap, np.int64), dofs.ndofs,
                        tile_h=H, extents=E, max_spill_frac=0.3,
                    )
                except ValueError as e:
                    print(f"# p={p} {oname} H={H} E={E}: {e}",
                          file=sys.stderr)
                    continue
                nc = dofs.dofmap.shape[0]
                if len(tb.spill_cells) > 0.02 * nc:
                    rec = dict(p=p, order=oname, H=H, E=E,
                               spill=len(tb.spill_cells), usable=False)
                    results.append(rec)
                    print(json.dumps(rec), flush=True)
                    continue
                ovf = build_gather_overflow(tb)
                mg = build_scatter_merge(tb)
                rec = dict(
                    p=p, order=oname, H=H, E=E, usable=True,
                    nbatch=tb.nbatch, B=tb.B, cpr=tb.cpr,
                    kg=tb.kg, kg_dense=(ovf.keep if ovf else tb.kg),
                    n_ov=(ovf.slots if ovf else 0),
                    ks=tb.ks, ks_merged=(mg.ks if mg else tb.ks),
                    nr=(mg.nrounds if mg else 0),
                    spill=len(tb.spill_cells),
                    ops=op_count(tb, ovf, mg),
                    us_pred=round(op_count(tb, ovf, mg) * 0.13, 1),
                    table_mb=round(tb.table_bytes / 1e6, 1),
                )
                results.append(rec)
                print(json.dumps(rec), flush=True)

    # rank usable configs per degree
    for p in args.degrees:
        rs = [r for r in results if r["p"] == p and r.get("usable")]
        rs.sort(key=lambda r: r["ops"])
        print(f"# p={p} best: " + "; ".join(
            f"{r['order']}/H{r['H']}E{r['E']} ops={r['ops']}"
            for r in rs[:3]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

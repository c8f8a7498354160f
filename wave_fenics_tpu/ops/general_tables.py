"""Host-side tables for the fused unstructured-dofmap Pallas operator.

The reference applies its operators on arbitrary DOLFINx meshes at device
speed with indirection kernels (gather common/cuda/scatter.cu:47-55,
atomicAdd scatter common/cuda/scatter.cu:57-65, fused operator
common/cuda/mass.hpp:74-95). TPUs have no scattered-address load/store
units, so an explicit-dofmap apply must be re-expressed in terms of what
the hardware does fast: contiguous DMA, the 2D vector unit's
``dynamic_gather`` (per-sublane lane gather / per-lane sublane gather),
and MXU matmuls.

Scheme (docs/DESIGN.md §7, realized):

1. Cells are locality-ordered and dofs numbered by first appearance
   (core.dofmap.build_dofmap(reorder='morton'|'appearance')), so a run of
   ``B`` consecutive cells touches a narrow contiguous dof-id *window*.
2. Per batch, the window ``x[start*128 : (start+H)*128]`` is one
   contiguous DMA, viewed as an ``[H, 128]`` tile (dof id = (start +
   row)*128 + lane). Window row H-1 is zeroed in-kernel (sentinel).
3. Element vectors live in a packed ``[H, 128]`` tile: cell slot ``b``
   occupies row ``b // cpr`` at lanes ``[(b % cpr)*nd, (b % cpr + 1)*nd)``
   with ``cpr = 128 // nd`` cells per row (FULL-lane packing: the scatter
   sentinel is a masked out-of-range lane value, not a reserved zero
   lane) — low degrees don't waste lanes and don't explode the chain
   count below. nd = 64 (p=3) packs 2 cells/row instead of 1.
4. The element gather ``xe[b, n] = x[dofmap[b, n]]`` becomes Kg "chains",
   each chain two shape-preserving dynamic gathers:
       T_k[t, c]  = Xw[t, lane_k[t, c]]      (gather along lanes)
       XE_k[r, c] = T_k[row_k[r, c], c]      (gather along sublanes)
   Each packed output (r, c) is claimed by exactly one chain; a chain can
   hold at most one source lane per (window-row, packed-lane) pair, so
   positions that collide go to the next chain. Unclaimed entries point at
   the zeroed sentinel row, and ``xe = sum_k XE_k``.
5. The scatter-add y[dofmap[b, n]] += ye[b, n] is the transpose, also as
   gather chains (deterministic, no atomics — the TPU answer to
   scatter.cu:57-65):
       P_j[t, c] = YE[row_j[t, c], c]        (gather along sublanes)
       Q_j[t, l] = P_j[t, nlane_j[t, l]]     (gather along lanes)
   Each dof copy (one per sharing cell) is claimed by one chain j; a dof
   shared by v cells in the batch needs v chains. Unclaimed (t, l) slots
   carry the OUT-OF-RANGE lane sentinel 128 (stored int8 as -128,
   decoded in-kernel as ``v & 0xFF`` and masked) — no element lane is
   reserved, so cells pack all 128 lanes. ``Yw += sum_j Q_j`` and the
   window is accumulated into the output with a read-modify-write DMA
   (grid iterations are sequential on a TensorCore, so overlapping
   windows of consecutive batches are race-free by construction).
6. Cells that overflow the window or the chain budget spill to the XLA
   indexed path; callers apply the fused kernel to the dense remainder
   and add the spill contribution.

Index tables are int8 (int16 only for window-row indices when H > 128),
so table traffic stays within a few x of the raw dofmap's.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["GeneralBatchTables", "build_batch_tables", "ScatterMerge",
           "build_scatter_merge", "GatherOverflow",
           "build_gather_overflow"]

_LANES = 128
#: scatter/merge "unclaimed" sentinel: the out-of-range lane value 128.
#: Stored in int8 tables as -128 (two's complement); decoded in-kernel /
#: in-emulation as ``v & 0xFF`` == 128 and MASKED, so all 128 element
#: lanes stay usable (full-lane packing, cpr = 128 // nd).
_SENT_LANE = _LANES
_SENT8 = np.int8(-128)


@dataclass(frozen=True)
class GeneralBatchTables:
    """Precomputed batch/window/chain tables (all NumPy, device-agnostic)."""

    #: tile height (sublane count) of every in-kernel tile; row H-1 is the
    #: zeroed gather sentinel, so windows hold at most (H-1)*128 dofs
    H: int
    #: element-tile rows that actually hold cells (ceil(B/cpr) padded to
    #: 8); element-row tables (g_row, geo) are stored at this COMPACT
    #: height — the kernel pads them back to H with sentinel/zero rows
    R: int
    #: max cells per batch
    B: int
    #: cells packed per element-tile row (cpr * nd <= 128)
    cpr: int
    #: element-tensor entries per cell
    nd: int
    nbatch: int
    #: [nbatch, E] int32 extent starts as ROW indices into the padded
    #: [*, 128] dof vector view: the in-kernel window is the
    #: concatenation of E disjoint He = H/E-row extents (E = 1 is the
    #: single contiguous window). Multi-extent windows keep the kernel
    #: mesh-size-independent: a Morton batch's dof rows always cluster
    #: into a few id-space runs (one per first-toucher epoch), while a
    #: single contiguous span grows ~N^(2/3) and stops fitting VMEM
    #: beyond ~16^3 cells.
    start_rows: np.ndarray
    #: [nbatch, B] int32 global cell ids (-1 = empty slot)
    batch_cells: np.ndarray
    #: gather chains: lanes int8 [Kg, nbatch, H, 128]; window rows
    #: int8/int16 [Kg, nbatch, R, 128] (compact)
    g_lane: np.ndarray
    g_row: np.ndarray
    #: scatter chains [Ks, nbatch, H, 128] int8 each
    s_row: np.ndarray
    s_nlane: np.ndarray
    #: int32 cell ids handled by the XLA fallback path
    spill_cells: np.ndarray
    #: number of [*, 128] rows the padded dof vector must have
    padded_rows: int
    #: element-tile ROWS PER CELL (1 for nd <= 128; 2 for p=5 hexes,
    #: nd <= 256: the cell's first npl nodes live in row ``b`` of the
    #: first half-block [0, R/2), the rest in row ``b`` of the second
    #: half-block [R/2, R) — halves are cheap major-dim slices for the
    #: split-block MXU contraction)
    rpc: int = 1

    @property
    def extents(self) -> int:
        return self.start_rows.shape[1]

    @property
    def He(self) -> int:
        return self.H // self.extents

    @property
    def kg(self) -> int:
        return self.g_lane.shape[0]

    @property
    def ks(self) -> int:
        return self.s_row.shape[0]

    @property
    def npl(self) -> int:
        """Nodes per element-tile row of one cell."""
        return -(-self.nd // self.rpc)

    @property
    def R2(self) -> int:
        """Rows per half-block (== R when rpc == 1)."""
        return self.R // self.rpc

    def cell_slot(self, b: int) -> tuple[int, int]:
        """Packed (row, lane_base) of cell slot ``b`` (rpc == 1 only)."""
        assert self.rpc == 1
        return b // self.cpr, (b % self.cpr) * self.nd

    def slot_coords(self, b: int) -> tuple[np.ndarray, np.ndarray]:
        """Per-node (row, lane) arrays [nd] of cell slot ``b`` for any
        rpc (the packed element-tile layout)."""
        n = np.arange(self.nd)
        if self.rpc == 1:
            r, lb = self.cell_slot(b)
            return np.full(self.nd, r), lb + n
        return b // self.cpr + (n // self.npl) * self.R2, n % self.npl

    @property
    def table_bytes(self) -> int:
        return sum(
            a.nbytes
            for a in (self.g_lane, self.g_row, self.s_row, self.s_nlane)
        )


def _cover_extents(rows: np.ndarray, E: int, He: int) -> np.ndarray | None:
    """Greedy cover of sorted unique dof-row indices by E DISJOINT
    extents of He rows each (8-aligned starts; the last extent's final
    row is reserved for the zero sentinel). Disjointness matters: the
    kernel read-modify-writes every extent back, so an HBM row held by
    two extents of one batch would lose updates. Returns int64 [E]
    increasing starts, or None when E extents cannot cover ``rows``."""
    starts = np.zeros(E, np.int64)
    i = 0
    prev_end = 0
    for e in range(E):
        if i >= len(rows):
            starts[e] = prev_end  # unused extent: parked, disjoint
            prev_end += He
            continue
        s = max(int(rows[i]) & ~7, prev_end)
        cap = He if e < E - 1 else He - 1
        if rows[i] >= s + cap:
            return None
        starts[e] = s
        while i < len(rows) and rows[i] < s + cap:
            i += 1
        prev_end = s + He
    if i < len(rows):
        return None
    return starts


_CACHE_VERSION = 4  # v4: full-lane packing (masked -128 scatter sentinel)
#: table builds below this cell count skip the disk cache (IO not worth it)
_CACHE_MIN_CELLS = 4096


def _cache_path(kind: str, key_parts) -> str | None:
    import hashlib
    import os

    d = os.environ.get(
        "WAVE_FENICS_TABLE_CACHE",
        os.path.expanduser("~/.wave_fenics_table_cache"),
    )
    if d in ("", "0", "off"):
        return None
    h = hashlib.blake2b(digest_size=20)
    h.update(f"v{_CACHE_VERSION}:{kind}".encode())
    for part in key_parts:
        if isinstance(part, np.ndarray):
            h.update(np.ascontiguousarray(part).tobytes())
            h.update(str(part.dtype).encode() + str(part.shape).encode())
        else:
            h.update(repr(part).encode())
    return os.path.join(d, f"{kind}-{h.hexdigest()}.npz")


def _cache_load(cls, path: str):
    import dataclasses
    import os

    if path is None or not os.path.exists(path):
        return None
    try:
        with np.load(path, allow_pickle=False) as z:
            kw = {}
            for f in dataclasses.fields(cls):
                v = z[f.name]
                kw[f.name] = (
                    v.item() if v.shape == () and f.type in ("int", int)
                    else v
                )
            return cls(**kw)
    except Exception:
        return None


def _cache_store(obj, path: str) -> None:
    import dataclasses
    import os
    import tempfile

    if path is None:
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                                   suffix=".npz")
        os.close(fd)
        np.savez_compressed(
            tmp,
            **{
                f.name: getattr(obj, f.name)
                for f in dataclasses.fields(obj)
            },
        )
        os.replace(tmp, path)
    except Exception:
        pass


def build_batch_tables(
    dofmap: np.ndarray,
    ndofs: int,
    *,
    batch_cells: int | None = None,
    tile_h: int = 128,
    extents: int = 1,
    max_gather_chains: int = 8,
    max_scatter_chains: int = 12,
    max_spill_frac: float | None = None,
    use_native: bool | None = None,
) -> GeneralBatchTables:
    """Build window/chain tables from an explicit dofmap [nc, nd].

    Cells must already be locality-ordered with dofs numbered by first
    appearance — ``core.dofmap.build_dofmap(reorder='morton')`` or
    ``reorder='appearance'`` (lexicographic imports).

    ``extents``: number of disjoint He = tile_h/extents-row DMA extents
    forming each in-kernel window. extents=1 is the contiguous window
    (only viable up to ~16^3-cell meshes); extents=4 covers Morton
    batches at any mesh size with the same total window height.

    Builds at >= 4096 cells are disk-cached (keyed by dofmap content +
    parameters; dir ``$WAVE_FENICS_TABLE_CACHE`` or
    ``~/.wave_fenics_table_cache``) — pass-2 chain assignment is
    host-side Python and takes minutes at production sizes.

    ``max_spill_frac``: abandon the build early (returning everything
    as spill) once that fraction of the cells seen so far has spilled —
    infeasible window configs (e.g. contiguous windows past ~16^3) then
    cost ~1s instead of a full degenerate build. Aborted builds are
    never disk-cached; the cache key is unchanged, so complete builds
    hit the same entries regardless of the limit.

    ``use_native``: route pass-2 chain assignment through the C++
    wavecore kernel (auto: whenever the native library is available).
    The native sequential first-fit is a refinement of the Python
    vectorized assignment (same-key same-lane claims may share a chain
    instead of deferring); both satisfy the claim invariants that make
    gather/scatter exact, but the table BITS can differ — the disk
    cache stores whichever built first.
    """
    dofmap = np.asarray(dofmap, dtype=np.int64)
    nc, nd = dofmap.shape
    cache = None
    if nc >= _CACHE_MIN_CELLS:
        cache = _cache_path(
            "batch",
            (dofmap, ndofs, batch_cells, tile_h, extents,
             max_gather_chains, max_scatter_chains),
        )
        hit = _cache_load(GeneralBatchTables, cache)
        if hit is not None:
            return hit
    if nd > 3 * _LANES:
        # split-row cells cover nd <= 384 (p <= 6 hexes) at rpc <= 3;
        # higher degrees stay on the XLA indexed path
        raise ValueError(f"nd={nd} exceeds {3 * _LANES} usable lanes")
    # rows per cell: all 128 lanes usable (the scatter sentinel is the
    # masked out-of-range value 128, not a reserved zero lane)
    rpc = 1 if nd <= _LANES else -(-nd // _LANES)
    npl = -(-nd // rpc)  # nodes per row of one cell
    H = tile_h
    if H % 8 or H > 256:
        raise ValueError("tile_h must be a multiple of 8, <= 256")
    E = extents
    if H % E or (H // E) % 8:
        raise ValueError("tile_h/extents must be a multiple of 8")
    He = H // E
    cpr = max(_LANES // nd, 1)
    # default: fill the element tile (128 cell rows — the int8 s_row
    # cap); pass 1 splits batches earlier when the extent budget runs
    # out, and FEWER grid steps matter: the platform charges a fixed
    # per-grid-step cost (docs/BENCH_NOTES.md round 3)
    # rows per half-block cap: 8-aligned when rpc > 1 (the kernel's
    # half-block slices xer[h*R2:(h+1)*R2] must hit sublane boundaries
    # or Mosaic relayouts them; 64 for rpc=2 — unchanged — and 40 for
    # rpc=3)
    R2cap = min(H, _LANES) // rpc
    if rpc > 1:
        R2cap &= ~7
    B = batch_cells if batch_cells is not None else (_LANES // rpc) * cpr
    B = min(B, cpr * (min(H - 1, _LANES) // rpc), cpr * R2cap)
    # rows per half-block, padded to 8; R = rpc * R2 element rows total
    R2 = min((-(-B // cpr) + 7) // 8 * 8, R2cap)
    R = rpc * R2
    # window-row indices are stored int8 UNSIGNED (two's complement,
    # decoded in-kernel/in-emulation as ``v & 0xFF``): H <= 256 keeps
    # every row in one byte and halves g_row DMA traffic vs int16
    row_dt = np.int8

    # --- pass 1: batching by extent-cover feasibility -------------------
    def cover(c0, n):
        rows = np.unique(dofmap[c0 : c0 + n] // _LANES)
        return _cover_extents(rows, E, He)

    spill: list[int] = []
    batches: list[list[int]] = []
    starts: list[np.ndarray] = []
    aborted = False
    c = 0
    while c < nc:
        if (max_spill_frac is not None and c >= 2048
                and len(spill) > max_spill_frac * c):
            spill.extend(range(c, nc))
            aborted = True
            break
        n = min(B, nc - c)
        st = cover(c, n)
        if st is None:
            # largest feasible prefix (cover is monotone in n)
            lo, hi = 0, n
            st_lo = None
            while lo + 1 < hi:
                mid = (lo + hi) // 2
                stm = cover(c, mid)
                if stm is not None:
                    lo, st_lo = mid, stm
                else:
                    hi = mid
            n, st = lo, st_lo
        if n == 0:
            spill.append(c)  # single cell exceeding the extent budget
            c += 1
            continue
        batches.append(list(range(c, c + n)))
        starts.append(st)
        c += n

    # --- pass 2: per-batch chain assignment -----------------------------
    sent_row = H - 1  # zeroed window/element row (gather sentinel)
    sent_lane = _SENT_LANE  # masked out-of-range lane (scatter sentinel)
    shape = (H, _LANES)
    rshape = (R, _LANES)  # compact element-row tables
    nrange = np.arange(nd)

    if use_native is None:
        from .. import native

        use_native = native.available() and hasattr(
            native._load(), "assign_chains"
        )
    kept_batches: list[np.ndarray] = []
    kept_starts: list[np.ndarray] = []
    all_g: list[tuple[list, list]] = []  # per batch: (g_lane_k, g_row_k)
    all_s: list[tuple[list, list]] = []
    for cells, est in zip(batches, starts):
        if use_native:
            from .. import native

            ca = np.asarray(cells, np.int64)
            gl, gs_, gr, sr, snl, su, keepb = native.assign_chains(
                dofmap[ca], est, He=He, H=H, R2=R2, rpc=rpc, npl=npl,
                cpr=cpr, max_g=max_gather_chains,
                max_s=max_scatter_chains,
            )
            kb = keepb.astype(bool)
            slots = np.full(B, -1, np.int32)
            slots[: len(ca)][kb] = ca[kb].astype(np.int32)
            spill.extend(int(c) for c in ca[~kb])
            if kb.any():
                gk = [k for k in range(max_gather_chains)
                      if gs_[k].any()]
                sk = [j for j in range(max_scatter_chains)
                      if su[j].any()]
                kept_batches.append(slots)
                kept_starts.append(est)
                all_g.append(([gl[k] for k in gk],
                              [gr[k][:R] for k in gk]))
                all_s.append(([sr[j] for j in sk],
                              [snl[j] for j in sk]))
            continue
        g_lane_c: list[np.ndarray] = []
        g_set_c: list[np.ndarray] = []
        g_row_c: list[np.ndarray] = []
        s_row_c: list[np.ndarray] = []
        s_set_c: list[np.ndarray] = []
        s_nlane_c: list[np.ndarray] = []
        s_used_c: list[np.ndarray] = []
        # cells keep their original slot b even when earlier slots spill
        # (claims are keyed on the slot; spilled slots stay all-sentinel
        # and read as zeros). Within one cell all (t, l) pairs are
        # distinct; (t, lo) pairs are distinct at rpc == 1 but can
        # repeat across the rpc == 2 halves — _first_of_key defers the
        # duplicate to the next chain so claims still vectorize.
        def _first_of_key(ok, t, lo):
            if rpc == 1 or not ok.any():
                return ok
            idx = np.nonzero(ok)[0]
            _, first = np.unique(t[idx] * _LANES + lo[idx],
                                 return_index=True)
            out = np.zeros_like(ok)
            out[idx[first]] = True
            return out

        slots = np.full(B, -1, np.int32)
        for b, cell in enumerate(cells):
            # per-node packed (element row, lane) of slot b
            if rpc == 1:
                r_ = np.full(nd, b // cpr, np.int64)
                lo_ = (b % cpr) * nd + nrange
            else:
                r_ = b // cpr + (nrange // npl) * R2
                lo_ = nrange % npl
            g = dofmap[cell] // _LANES
            l = dofmap[cell] % _LANES
            # window row through the (disjoint, increasing) extent map
            e = np.searchsorted(est, g, side="right") - 1
            t = e * He + (g - est[e])
            g_chain = np.full(nd, -1, np.int64)
            un = np.ones(nd, bool)
            k = 0
            while un.any() and k < max_gather_chains:
                if k == len(g_lane_c):
                    g_lane_c.append(np.zeros(shape, np.int16))
                    g_set_c.append(np.zeros(shape, bool))
                    g_row_c.append(np.full(rshape, sent_row, np.int16))
                ok = un & (
                    ~g_set_c[k][t, lo_] | (g_lane_c[k][t, lo_] == l)
                )
                ok = _first_of_key(ok, t, lo_)
                g_chain[ok] = k
                un &= ~ok
                k += 1
            fits = not un.any()
            s_chain = np.full(nd, -1, np.int64)
            if fits:
                un = np.ones(nd, bool)
                j = 0
                while un.any() and j < max_scatter_chains:
                    if j == len(s_row_c):
                        s_row_c.append(np.zeros(shape, np.int16))
                        s_set_c.append(np.zeros(shape, bool))
                        s_nlane_c.append(
                            np.full(shape, sent_lane, np.int16)
                        )
                        s_used_c.append(np.zeros(shape, bool))
                    ok = un & ~s_used_c[j][t, l] & (
                        ~s_set_c[j][t, lo_] | (s_row_c[j][t, lo_] == r_)
                    )
                    ok = _first_of_key(ok, t, lo_)
                    s_chain[ok] = j
                    un &= ~ok
                    j += 1
                fits = not un.any()
            if fits:
                for k in np.unique(g_chain):
                    m = g_chain == k
                    g_lane_c[k][t[m], lo_[m]] = l[m]
                    g_set_c[k][t[m], lo_[m]] = True
                    g_row_c[k][r_[m], lo_[m]] = t[m]
                for j in np.unique(s_chain):
                    m = s_chain == j
                    s_row_c[j][t[m], lo_[m]] = r_[m]
                    s_set_c[j][t[m], lo_[m]] = True
                    s_nlane_c[j][t[m], l[m]] = lo_[m]
                    s_used_c[j][t[m], l[m]] = True
                slots[b] = cell
            else:
                spill.append(cell)  # claims were never committed
        # drop chains that lost all their claims to spilled cells
        g_keep = [i for i, u in enumerate(g_set_c) if u.any()]
        s_keep = [i for i, u in enumerate(s_used_c) if u.any()]
        if (slots >= 0).any():
            kept_batches.append(slots.copy())
            kept_starts.append(est)
            all_g.append(([g_lane_c[i] for i in g_keep],
                          [g_row_c[i] for i in g_keep]))
            all_s.append(([s_row_c[i] for i in s_keep],
                          [s_nlane_c[i] for i in s_keep]))
    nbatch = len(kept_batches)

    bc = (np.stack(kept_batches) if kept_batches
          else np.zeros((0, B), np.int32))
    Kg = max((len(g[0]) for g in all_g), default=1) or 1
    Ks = max((len(s[0]) for s in all_s), default=1) or 1

    def _stack(per_batch, default, dt, K, shp=shape):
        # default wraps mod 2^8 for the unsigned-int8 row encoding
        out = np.full((K, max(nbatch, 1)) + shp,
                      np.array(default, np.int64).astype(dt), dt)
        for i, chains in enumerate(per_batch):
            for k, ch in enumerate(chains):
                out[k, i] = ch.astype(dt)
        return out

    padded_rows = max(
        (ndofs + _LANES - 1) // _LANES + 1,
        (max(int(s.max()) for s in kept_starts) + He) if kept_starts
        else 1,
    )
    st = (np.stack(kept_starts).astype(np.int32) if kept_starts
          else np.zeros((0, E), np.int32))
    tb = GeneralBatchTables(
        H=H, R=R, B=B, cpr=cpr, nd=nd, nbatch=nbatch,
        start_rows=st,
        batch_cells=bc,
        g_lane=_stack([g[0] for g in all_g], 0, np.int8, Kg)[:, :nbatch],
        g_row=_stack([g[1] for g in all_g], sent_row, row_dt,
                     Kg, rshape)[:, :nbatch],
        s_row=_stack([s[0] for s in all_s], 0, np.int8, Ks)[:, :nbatch],
        s_nlane=_stack([s[1] for s in all_s], sent_lane, np.int8,
                       Ks)[:, :nbatch],
        spill_cells=np.asarray(sorted(spill), np.int32),
        padded_rows=padded_rows,
        rpc=rpc,
    )
    if not aborted:
        _cache_store(tb, cache)
    return tb


@dataclass(frozen=True)
class ScatterMerge:
    """Element-space claim pre-reduction tables (docs/DESIGN.md §7):
    per round, YE_t[c1, r1] += YE_t[c2, r2] merges duplicate claims of
    one window dof inside the element tile with two lane-wise gathers,
    so the per-window scatter needs only ``ks`` chains afterwards.

    Constraint per round: A is keyed (c2, r1) -> r2 and B (r1, c1) ->
    c2; two merges sharing a key must land in different rounds."""

    #: [nrounds, nbatch, 128, 128] int8: A[c2, r1] = r2 (sentinel: any —
    #: masked by B), B[r1, c1] = c2 (sentinel -128, decoded 128, masked)
    A: np.ndarray
    B: np.ndarray
    #: merged scatter chains, same encoding as GeneralBatchTables
    s_row: np.ndarray
    s_nlane: np.ndarray

    @property
    def nrounds(self) -> int:
        return self.A.shape[0]

    @property
    def ks(self) -> int:
        return self.s_row.shape[0]


def build_scatter_merge(
    tb: GeneralBatchTables, max_chains: int = 1, max_rounds: int = 4,
    use_native: bool | None = None,
) -> ScatterMerge | None:
    """Re-encode ``tb``'s scatter chains as merge rounds + few chains.

    Decodes every (window row t, window lane l) claim list from the
    chain tables, binary-tree merges claims inside the element tile
    (respecting the per-round A/B key constraints), and rebuilds the
    residual chains. Returns None when the claim structure cannot be
    reduced to ``max_chains`` within ``max_rounds`` (callers keep the
    plain chains). Large builds are disk-cached like
    :func:`build_batch_tables` (None results as an empty marker)."""
    H, nb = tb.H, tb.nbatch
    cache = None
    if nb * tb.B >= _CACHE_MIN_CELLS:
        import os

        cache = _cache_path(
            "merge",
            (tb.s_row, tb.s_nlane, tb.start_rows, max_chains,
             max_rounds),
        )
        if cache is not None and os.path.exists(cache + ".none"):
            return None
        hit = _cache_load(ScatterMerge, cache)
        if hit is not None:
            return hit
    sent_lane = _SENT_LANE  # logical 128; int8 storage wraps to -128
    if use_native is None:
        from .. import native

        use_native = native.available() and hasattr(
            native._load(), "scatter_merge_batch"
        )
    A = np.zeros((max_rounds, nb, _LANES, _LANES), np.int8)
    B = np.full((max_rounds, nb, _LANES, _LANES), _SENT8, np.int8)
    a_used = np.zeros((max_rounds, nb, _LANES, _LANES), bool)
    rounds_used = 0
    new_rows: list[list[np.ndarray]] = []
    new_lanes: list[list[np.ndarray]] = []
    for i in range(nb):
        if use_native:
            from .. import native

            rounds, Ab, Bb, orow, onl, ksb = native.scatter_merge_batch(
                tb.s_row[:, i], tb.s_nlane[:, i],
                max_chains=max_chains, max_rounds=max_rounds,
            )
            if rounds >= 0:
                A[:, i] = Ab
                B[:, i] = Bb
                rounds_used = max(rounds_used, rounds)
                new_rows.append([orow[j] for j in range(ksb)])
                new_lanes.append([onl[j] for j in range(ksb)])
                continue
            # constraint allocation failed natively (key-order
            # sensitive); retry this batch with the Python builder
        claims: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for j in range(tb.ks):
            nl = tb.s_nlane[j, i].astype(np.int64) & 0xFF
            tt, ll = np.nonzero(nl != sent_lane)
            cc = nl[tt, ll]
            rr = tb.s_row[j, i, tt, cc].astype(np.int64)
            for t, l, c, r in zip(tt, ll, cc, rr):
                claims.setdefault((int(t), int(l)), []).append(
                    (int(r), int(c))
                )
        # binary-tree merge each list down to max_chains claims
        for key, lst in claims.items():
            rnd = 0
            while len(lst) > max_chains:
                if rnd >= max_rounds:
                    if cache is not None:
                        try:
                            open(cache + ".none", "w").close()
                        except OSError:
                            pass
                    return None
                nxt: list[tuple[int, int]] = []
                k = 0
                while k < len(lst):
                    if k + 1 >= len(lst):
                        nxt.append(lst[k])
                        break
                    placed = False
                    for (r1, c1), (r2, c2) in (
                        (lst[k], lst[k + 1]),
                        (lst[k + 1], lst[k]),
                    ):
                        if (
                            not a_used[rnd, i, c2, r1]
                            or A[rnd, i, c2, r1] == r2
                        ) and B[rnd, i, r1, c1] == _SENT8:
                            A[rnd, i, c2, r1] = r2
                            a_used[rnd, i, c2, r1] = True
                            B[rnd, i, r1, c1] = c2
                            nxt.append((r1, c1))
                            placed = True
                            break
                    if not placed:
                        # defer both claims to the next round unmerged
                        nxt.extend((lst[k], lst[k + 1]))
                    k += 2
                lst = nxt
                rnd += 1
            claims[key] = lst
            rounds_used = max(rounds_used, rnd)
        # residual chains: first-fit on the (t, c) row-table key (two
        # dofs may claim the same source lane c at the same window row)
        rows: list[np.ndarray] = []
        rset: list[np.ndarray] = []
        lanes: list[np.ndarray] = []
        for (t, l), lst in claims.items():
            for r, c in lst:
                j = 0
                while True:
                    if j == len(rows):
                        rows.append(np.zeros((H, _LANES), np.int16))
                        rset.append(np.zeros((H, _LANES), bool))
                        lanes.append(
                            np.full((H, _LANES), sent_lane, np.int16)
                        )
                    if not rset[j][t, c] or rows[j][t, c] == r:
                        if lanes[j][t, l] == sent_lane:
                            rows[j][t, c] = r
                            rset[j][t, c] = True
                            lanes[j][t, l] = c
                            break
                    j += 1
        new_rows.append(rows)
        new_lanes.append(lanes)

    if rounds_used == 0:
        if cache is not None:
            try:
                open(cache + ".none", "w").close()
            except OSError:
                pass
        return None  # nothing to merge; keep the original chains
    Ks = max((len(r) for r in new_rows), default=1) or 1
    s_row = np.zeros((Ks, max(nb, 1), H, _LANES), np.int8)
    s_nlane = np.full((Ks, max(nb, 1), H, _LANES), _SENT8, np.int8)
    for i in range(nb):
        for j in range(len(new_rows[i])):
            s_row[j, i] = new_rows[i][j].astype(np.int8)
            s_nlane[j, i] = new_lanes[i][j].astype(np.int8)
    mg = ScatterMerge(
        A=A[:rounds_used], B=B[:rounds_used],
        s_row=s_row[:, :nb], s_nlane=s_nlane[:, :nb],
    )
    _cache_store(mg, cache)
    return mg


@dataclass(frozen=True)
class GatherOverflow:
    """Per-entry re-encoding of the sparse gather-chain tail.

    Gather chains beyond the first two hold <~1% of the claims on
    typical first-appearance dofmaps, yet each chain costs dense
    [H, 128] + [128, 128] tables per batch (~48 KB). Entries of chains
    >= ``keep`` are stored instead as 128-entry slots of (window row t,
    source lane l, element row r, packed lane c) quadruples — 1 KB per
    slot — applied in-kernel by two masked lane-gathers + one one-hot
    MXU matmul (exact: every (r, c) is claimed at most once). This is
    the TPU analogue of the reference letting rare indirections ride
    the same gather kernel (common/cuda/scatter.cu:47-55) — rare cases
    must not set the dense-table budget."""

    #: [slots, nbatch, 4, 128] int16, rows (t, l, r, c); padding
    #: entries are (H-1, 0, 0, 127): they read the zeroed sentinel
    #: window row, so v = 0 and any target (r, c) slot is safe
    tab: np.ndarray
    #: number of dense chains kept ahead of this encoding
    keep: int

    @property
    def slots(self) -> int:
        return self.tab.shape[0]


def build_gather_overflow(
    tb: GeneralBatchTables, keep: int = 2, max_slots: int = 4
) -> GatherOverflow | None:
    """Encode gather chains >= ``keep`` as overflow entry slots.

    Returns None when any batch's tail exceeds ``max_slots * 128``
    entries (callers keep the dense chains) or when there is no tail."""
    if tb.kg <= keep:
        return None
    H = tb.H
    sent = H - 1
    per_batch: list[np.ndarray] = []
    maxn = 0
    for i in range(tb.nbatch):
        es = []
        for k in range(keep, tb.kg):
            row = tb.g_row[k, i].astype(np.int64) & 0xFF
            rr, cc = np.nonzero(row != sent)
            tt = row[rr, cc]
            ll = tb.g_lane[k, i, tt, cc].astype(np.int64)
            es.append(np.stack([tt, ll, rr, cc], axis=1))
        e = (np.concatenate(es, axis=0) if es
             else np.zeros((0, 4), np.int64))
        per_batch.append(e)
        maxn = max(maxn, len(e))
    slots = -(-maxn // _LANES) if maxn else 1
    if slots > max_slots:
        return None
    tab = np.zeros((slots, tb.nbatch, 4, _LANES), np.int16)
    tab[:, :, 0, :] = sent
    tab[:, :, 3, :] = _LANES - 1
    for i, e in enumerate(per_batch):
        if len(e):
            flat = tab[:, i].transpose(0, 2, 1).reshape(-1, 4)
            flat[: len(e)] = e
            tab[:, i] = flat.reshape(slots, _LANES, 4).transpose(0, 2, 1)
    return GatherOverflow(tab=tab, keep=keep)


def reference_merge_scatter(
    tb: GeneralBatchTables, mg: ScatterMerge, ye: np.ndarray, ndofs: int
) -> np.ndarray:
    """NumPy emulation of merge rounds + residual chains (tests)."""
    H = tb.H
    yv = np.zeros((tb.padded_rows, _LANES), dtype=ye.dtype)
    for i in range(tb.nbatch):
        yet = ye[i, :_LANES].T.copy()  # [c, r]
        for rnd in range(mg.nrounds):
            Ar = mg.A[rnd, i].astype(np.int64)
            Br = mg.B[rnd, i].astype(np.int64) & 0xFF
            s1 = np.take_along_axis(yet, Ar, axis=1)  # [c2, r1]
            s2 = np.take_along_axis(
                s1.T, np.minimum(Br, _LANES - 1), axis=1
            )  # [r1, c1]
            yet = yet + np.where(Br < _SENT_LANE, s2, 0.0).T
        acc = np.zeros((H, _LANES), dtype=ye.dtype)
        for j in range(mg.ks):
            row = mg.s_row[j, i].astype(np.int64)
            nlane = mg.s_nlane[j, i].astype(np.int64) & 0xFF
            P = np.take_along_axis(yet.T, row, axis=0)
            Q = np.take_along_axis(
                P, np.minimum(nlane, _LANES - 1), axis=1
            )
            acc += np.where(nlane < _SENT_LANE, Q, 0.0)
        He = tb.He
        for e, s in enumerate(tb.start_rows[i]):
            yv[s : s + He] += acc[e * He : (e + 1) * He]
    return yv.reshape(-1)[:ndofs]


def pack_cell_values(tables: GeneralBatchTables, vals: np.ndarray,
                     dtype=np.float32) -> np.ndarray:
    """Pack per-cell nodal values [nc, nd] into COMPACT element tiles
    [ngeo?, nbatch, R, 128] matching the packed XE/YE cell rows (zeros in
    empty slots). ``vals`` may carry leading axes (e.g. [6, nc, nd])."""
    lead = vals.shape[:-2]
    out = np.zeros(lead + (tables.nbatch, tables.R, _LANES),
                   dtype=np.dtype(dtype))
    # slot coordinates once per slot, then one fancy assignment per batch
    rs = np.stack([tables.slot_coords(b)[0] for b in range(tables.B)])
    ls = np.stack([tables.slot_coords(b)[1] for b in range(tables.B)])
    for i in range(tables.nbatch):
        bc = tables.batch_cells[i]
        m = bc >= 0
        if m.any():
            out[..., i, rs[m], ls[m]] = vals[..., bc[m], :]
    return out


def pack_cell_qvalues(tables: GeneralBatchTables, vals: np.ndarray,
                      T: int, dtype=np.float32) -> np.ndarray:
    """Pack per-cell QUADRATURE-point values [nc, nq] (nq independent of
    nd — the non-collocated case) into ``T`` q-space tiles
    [T, nbatch, R, 128]: the cell packed at slot (r, g) occupies lanes
    [g*nq_t, g*nq_t + cnt_t) of tile ``t``, holding its qpoints
    [t*nq_t, t*nq_t + cnt_t), nq_t = ceil(nq / T). Layout matches
    ``pallas_general.interpolation_tiles``."""
    nc, nq = vals.shape
    nq_t = -(-nq // T)
    if tables.rpc != 1:
        # split-row cells: one cell per BASE row (cpr == 1), q-tile t of
        # the cell at slot b lives at row b, lanes [0, cnt_t)
        if tables.cpr != 1:
            raise ValueError("split-row q-tile packing requires cpr=1")
        if nq_t > _LANES:
            raise ValueError("q-tile lanes exceed 128; raise T")
        out = np.zeros((T, tables.nbatch, tables.R, _LANES),
                       dtype=np.dtype(dtype))
        for i in range(tables.nbatch):
            bc = tables.batch_cells[i]
            m = bc >= 0
            if not m.any():
                continue
            rows = np.nonzero(m)[0]  # base row of slot b is b (cpr=1)
            for t in range(T):
                cnt = min(nq_t, nq - t * nq_t)
                out[t, i, rows[:, None], np.arange(cnt)] = vals[
                    bc[m], t * nq_t : t * nq_t + cnt
                ]
        return out
    if tables.cpr * nq_t > _LANES:
        raise ValueError("q-tile lanes exceed 128; raise T")
    out = np.zeros((T, tables.nbatch, tables.R, _LANES),
                   dtype=np.dtype(dtype))
    # per-slot packed coordinates once, then fancy assignments per batch
    bs = np.arange(tables.B)
    rows = bs // tables.cpr
    gs = (bs % tables.cpr)
    for i in range(tables.nbatch):
        bc = tables.batch_cells[i]
        m = bc >= 0
        if not m.any():
            continue
        for t in range(T):
            cnt = min(nq_t, nq - t * nq_t)
            lanes = gs[m, None] * nq_t + np.arange(cnt)
            out[t, i, rows[m, None], lanes] = vals[
                bc[m], t * nq_t : t * nq_t + cnt
            ]
    return out


def window_view(tables: GeneralBatchTables, xv: np.ndarray, i: int
                ) -> np.ndarray:
    """Concatenated E-extent window of batch ``i`` (copy)."""
    He = tables.He
    return np.concatenate(
        [xv[s : s + He] for s in tables.start_rows[i]], axis=0
    )


def reference_gather(tables: GeneralBatchTables, x: np.ndarray
                     ) -> np.ndarray:
    """NumPy emulation of the in-kernel gather chains (for tests):
    returns the packed XE tiles [nbatch, H, 128]."""
    H = tables.H
    xp = np.zeros(tables.padded_rows * _LANES, dtype=x.dtype)
    xp[: x.size] = x
    xv = xp.reshape(-1, _LANES)
    out = np.zeros((tables.nbatch, H, _LANES), dtype=x.dtype)
    sent = np.full((H - tables.R, _LANES), H - 1, np.int64)
    for i in range(tables.nbatch):
        Xw = window_view(tables, xv, i)
        Xw[H - 1] = 0.0
        for k in range(tables.kg):
            lane = tables.g_lane[k, i].astype(np.int64)
            row = np.concatenate(
                [tables.g_row[k, i].astype(np.int64) & 0xFF, sent]
            )
            T = np.take_along_axis(Xw, lane, axis=1)
            out[i] += np.take_along_axis(T, row, axis=0)
    return out


def reference_scatter(tables: GeneralBatchTables, ye: np.ndarray,
                      ndofs: int) -> np.ndarray:
    """NumPy emulation of the in-kernel scatter chains + window RMW."""
    H = tables.H
    yv = np.zeros((tables.padded_rows, _LANES), dtype=ye.dtype)
    for i in range(tables.nbatch):
        YE = ye[i]
        acc = np.zeros((H, _LANES), dtype=ye.dtype)
        for j in range(tables.ks):
            row = tables.s_row[j, i].astype(np.int64)
            nlane = tables.s_nlane[j, i].astype(np.int64) & 0xFF
            P = np.take_along_axis(YE, row, axis=0)
            Q = np.take_along_axis(
                P, np.minimum(nlane, _LANES - 1), axis=1
            )
            acc += np.where(nlane < _SENT_LANE, Q, 0.0)
        He = tables.He
        for e, s in enumerate(tables.start_rows[i]):
            yv[s : s + He] += acc[e * He : (e + 1) * He]
    return yv.reshape(-1)[:ndofs]

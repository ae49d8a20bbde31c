"""Geometric grid renumbering: make ANY mesh grid-kernel-ready.

The VMEM-resident Pallas CG kernels (``ops/gridop.py`` +
``solve/pallas_cg.py``) require a *grid-structured numbering*: N = ns²
node ids laid out so that node id = row·ns + lane with (row, lane)
tracking (x, y), making every operator coupling a small 2-D grid offset.
Round 2 only our own ``generate_annulus_mesh(pad_hole=True)`` meshes had
that property; imported Triangle meshes — including the reference's own
``mesh_fine.1`` (``/root/reference/resources/mesh_fine.1.node``) — could
not use the fastest path at all (VERDICT r2 §missing #1).

This module assigns every node of an arbitrary mesh to a slot of an
ns×ns raster:

* **rows** (grid axis 0 ↔ x): nodes sorted by x, rank-partitioned into
  ns balanced bands — x≈0 nodes are forced to row 0 and x≈L nodes to
  row ns−1 so the periodic-pair structure the pressure kernel keys on
  (masters row 0, slaves row ns−1, matching lanes) holds by
  construction.
* **lanes** (grid axis 1 ↔ y): within each row, nodes sorted by y take
  the lane nearest ⌊y/H·ns⌋ under a strictly-increasing constraint
  (vectorized monotone clamp) — lanes stay geometrically aligned
  *across* rows, which is what bounds the lane offset |s| of mesh
  edges.
* **slaves copy their master's lane** so periodic pairs sit on the same
  lane of opposite rows.
* unfilled slots become inert *dummy nodes* (marker −1, no incident
  triangles, zero operator rows) with coordinates clamped strictly
  inside the domain so coordinate-based boundary discovery
  (``bc.find_periodic_pairs``) never picks them up.

For a quasi-uniform mesh of N nodes, an edge spans ~h in x ⇒ ~1 row
band, and the per-band lane alignment drifts by the local density
contrast ⇒ |Δlane| of a few: couplings concentrate on ~20–40 offsets,
which :class:`tpufem.ops.gridop.GridOperator` turns into dense
roll-diagonals (the tail goes to its exact one-hot remainder).
Mesh-density contrast c costs ~√c extra offset spread — strongly graded
meshes may exceed the decomposition's remainder budget, in which case
``GridOperator.build`` raises and the caller falls back to
stencil/banded storage.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpufem.mesh.core import Mesh, mesh_from_arrays


class GridifyError(ValueError):
    """The mesh cannot be given a grid-compatible numbering."""


@dataclasses.dataclass(frozen=True)
class Gridified:
    """A renumbered mesh plus the old→new node permutation."""

    mesh: Mesh  # N = ns² nodes (dummy-padded), grid-structured numbering
    perm: np.ndarray  # (N_old,) old node id → new node id
    ns: int

    def push(self, field: np.ndarray) -> np.ndarray:
        """Scatter an (N_old, ...) nodal field to the (ns², ...) layout."""
        out = np.zeros((self.ns * self.ns,) + field.shape[1:], field.dtype)
        out[self.perm] = field
        return out

    def pull(self, field: np.ndarray) -> np.ndarray:
        """Gather an (ns², ...) nodal field back to the original order."""
        return np.asarray(field)[self.perm]


def _monotone_lanes(t: np.ndarray, ns: int) -> np.ndarray:
    """Strictly-increasing lane assignment nearest the (sorted) targets t.

    Vectorized: m_i = max_{j≤i}(t_j − j) is the smallest non-decreasing
    envelope making lanes = m + arange strictly increasing; capping m at
    ns−k keeps every lane < ns while preserving monotonicity."""
    k = len(t)
    if k == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.arange(k)
    m = np.maximum.accumulate(t - idx)
    return np.minimum(m, ns - k) + idx


def gridify_points(
    coords: np.ndarray,
    L: float = 1.0,
    H: float = 1.0,
    ns: int | None = None,
) -> tuple[np.ndarray, int]:
    """(perm, ns): raster numbering for a bare point cloud.

    The non-periodic core of :func:`gridify_mesh` — capacity-constrained
    geometric row bands + monotone geometric lanes — without the
    edge-pinning / periodic-pair machinery.  Used for dof spaces that are
    not P1 mesh nodes: the P2 velocity dofs and the P1 pressure dofs of
    the Taylor–Hood grid kernels (``workloads/th_sparse.py``), where the
    quasi-uniform refined lattice makes every FEM coupling a small 2-D
    grid offset under this numbering.  ``perm[old_id] = row·ns + lane``.
    """
    coords = np.asarray(coords)
    n = coords.shape[0]
    x, y = coords[:, 0], coords[:, 1]
    if ns is None:
        ns = int(np.ceil(np.sqrt(n)))
    assert ns * ns >= n, (ns, n)

    order = np.lexsort((y, x))
    t = np.clip((x[order] / L * ns).astype(np.int64), 0, ns - 1)
    cap = ns
    r = t.copy()
    # capacity-constrained monotone rows (same fixpoint sweeps as
    # gridify_mesh, without the edge pinning)
    while True:
        prev = r[:-cap] + 1
        upd = np.maximum(r[cap:], prev)
        if (upd == r[cap:]).all():
            break
        r[cap:] = upd
        np.maximum.accumulate(r, out=r)
    r = np.minimum(r, ns - 1)
    while True:
        nxt = r[cap:] - 1
        upd = np.minimum(r[:-cap], nxt)
        if (upd == r[:-cap]).all():
            break
        r[:-cap] = upd
        r = np.minimum.accumulate(r[::-1])[::-1]
    if r[0] < 0 or (np.bincount(r, minlength=ns) > cap).any():
        raise GridifyError(
            "infeasible capacity-constrained row assignment "
            "(n > ns² should be impossible here)"
        )
    row = np.empty(n, dtype=np.int64)
    row[order] = r

    lane = np.empty(n, dtype=np.int64)
    for rr in np.unique(row):
        ids = np.nonzero(row == rr)[0]
        o = ids[np.argsort(y[ids], kind="stable")]
        tgt = np.clip((y[o] / H * ns).astype(np.int64), 0, ns - 1)
        lane[o] = _monotone_lanes(tgt, ns)

    perm = row * ns + lane
    if len(np.unique(perm)) != n:
        raise GridifyError("internal error: non-injective slot assignment")
    return perm.astype(np.int64), ns


def gridify_mesh(
    mesh: Mesh,
    L: float = 1.0,
    H: float = 1.0,
    tol: float = 1e-6,
) -> Gridified:
    """Renumber ``mesh`` onto an ns×ns raster (see module docstring)."""
    from tpufem.bc import find_periodic_pairs

    coords = np.asarray(mesh.coords)
    n = mesh.n_nodes
    x, y = coords[:, 0], coords[:, 1]
    left = np.abs(x) < tol
    right = np.abs(x - L) < tol
    n_left, n_right = int(left.sum()), int(right.sum())

    ns = max(int(np.ceil(np.sqrt(n))), n_left, n_right)
    # middle rows must hold the non-edge nodes at ≤ ns per row
    n_mid = n - n_left - n_right
    while max(ns - 2, 1) * ns < n_mid:
        ns += 1

    row = np.empty(n, dtype=np.int64)
    lane = np.empty(n, dtype=np.int64)

    # --- rows: GEOMETRIC targets with capacity-constrained monotone
    # assignment, edges pinned.  Pure x-rank bands (round-3 first cut)
    # smear the offsets on meshes whose x-columns have varying lengths
    # (the hole shortens interior columns, so fixed-size rank bands slice
    # across physical columns): instead each node targets its geometric
    # row floor(x/L·ns) and is displaced only as far as the ≤ns-per-row
    # capacity requires — on exact-grid point sets this reproduces the
    # physical columns perfectly.
    row[left] = 0
    row[right] = ns - 1
    mid = np.nonzero(~(left | right))[0]
    if len(mid):
        order = mid[np.lexsort((y[mid], x[mid]))]
        t = np.clip((x[order] / L * ns).astype(np.int64), 1, ns - 2)
        cap = ns
        r = t.copy()
        # forward: r_i = max(t_i, r_{i-cap}+1) to fixpoint (≤ns passes)
        while True:
            prev = r[:-cap] + 1
            upd = np.maximum(r[cap:], prev)
            if (upd == r[cap:]).all():
                break
            r[cap:] = upd
            np.maximum.accumulate(r, out=r)  # keep monotone between passes
        # backward: cap at ns-2 and r_i ≤ r_{i+cap}−1
        r = np.minimum(r, ns - 2)
        while True:
            nxt = r[cap:] - 1
            upd = np.minimum(r[:-cap], nxt)
            if (upd == r[:-cap]).all():
                break
            r[:-cap] = upd
            # keep monotone (non-decreasing) from the back
            r = np.minimum.accumulate(r[::-1])[::-1]
        if r[0] < 1 or (np.bincount(r, minlength=ns) > cap).any():
            raise GridifyError(
                "internal error: infeasible capacity-constrained row "
                "assignment (n_mid > (ns-2)*ns should be impossible)"
            )
        row[order] = r

    # --- lanes -----------------------------------------------------------
    def assign_row_lanes(ids: np.ndarray):
        o = ids[np.argsort(y[ids], kind="stable")]
        t = np.clip((y[o] / H * ns).astype(np.int64), 0, ns - 1)
        lane[o] = _monotone_lanes(t, ns)

    for r in range(1, ns - 1):
        assign_row_lanes(np.nonzero(row == r)[0])
    assign_row_lanes(np.nonzero(left)[0])

    # row ns−1: periodic slaves inherit their master's lane (the pressure
    # kernel's roll-based merge requires mj == sj — pallas_cg.py:292-304);
    # unpaired x≈L nodes (wall corners) fill nearby free lanes
    masters, slaves = find_periodic_pairs(coords, L=L, H=H, tol=tol)
    if len(slaves) != len(set(int(s) for s in slaves)):
        raise GridifyError(
            "periodic nearest-y matching is not injective on this mesh "
            "(two x≈0 nodes share an x≈L partner) — the grid pressure "
            "kernel cannot represent it; use stencil/banded storage"
        )
    right_ids = np.nonzero(right)[0]
    if n_right:
        taken = np.zeros(ns, dtype=bool)
        lane[slaves] = lane[masters]
        taken[lane[slaves]] = True
        unpaired = np.setdiff1d(right_ids, slaves)
        free = np.nonzero(~taken)[0]
        if len(unpaired):
            o = unpaired[np.argsort(y[unpaired], kind="stable")]
            t = np.clip((y[o] / H * ns).astype(np.int64), 0, ns - 1)
            # greedy nearest free lane, y-ordered (few nodes: corners)
            for i, target in zip(o, t):
                j = int(np.argmin(np.abs(free - target)))
                lane[i] = free[j]
                free = np.delete(free, j)

    new_id = row * ns + lane
    # every (row, lane) must be unique — guaranteed by construction, but a
    # violated invariant here would silently corrupt the operator
    if len(np.unique(new_id)) != n:
        raise GridifyError("internal error: non-injective slot assignment")

    n_new = ns * ns
    new_coords = np.empty((n_new, 2))
    # dummy coords: nominal slot centers clamped strictly inside the
    # domain so coordinate-predicate boundary discovery ignores them
    rr, ll = np.divmod(np.arange(n_new), ns)
    pad = 1.0 / (2.0 * ns)
    new_coords[:, 0] = np.clip(rr / max(ns - 1, 1) * L, pad * L, (1 - pad) * L)
    new_coords[:, 1] = np.clip(ll / max(ns - 1, 1) * H, pad * H, (1 - pad) * H)
    new_coords[new_id] = coords
    new_markers = np.full(n_new, -1, dtype=np.int32)
    new_markers[new_id] = mesh.markers
    perm = new_id.astype(np.int64)
    new_mesh = mesh_from_arrays(
        new_coords,
        perm[mesh.tris].astype(np.int32),
        new_markers,
        holes=mesh.holes,
    )
    return Gridified(mesh=new_mesh, perm=perm, ns=ns)


def grid_numbering_ok(mesh: Mesh, max_offsets: int = 24, rest_cap: int | None = None) -> bool:
    """Cheap host-side check: is the numbering already grid-structured?

    Estimates the offset concentration from the triangle adjacency alone
    (no assembly): true iff N = ns² and the top ``max_offsets`` (dy, s)
    offsets leave at most ``rest_cap`` couplings uncovered — the same
    criterion :class:`~tpufem.ops.gridop.GridOperator` enforces."""
    n = mesh.n_nodes
    ns = int(round(np.sqrt(n)))
    if ns * ns != n:
        return False
    tris = np.asarray(mesh.tris, dtype=np.int64)
    a = np.repeat(tris, 3, axis=1).ravel()  # rows:  t0 t0 t0 t1 t1 t1 ...
    b = np.tile(tris, (1, 3)).ravel()  # cols:  t0 t1 t2 t0 t1 t2 ...
    pairs = np.unique(a * np.int64(n) + b)
    rows, cols = np.divmod(pairs, np.int64(n))
    iy, ix = np.divmod(rows, ns)
    jy, jx = np.divmod(cols, ns)
    key = (jy - iy) * ns + (jx - ix) % ns
    _, counts = np.unique(key, return_counts=True)
    counts = np.sort(counts)[::-1]
    rest = int(counts[max_offsets:].sum())
    cap = rest_cap if rest_cap is not None else max(4096, n // 8)
    return rest <= cap


def ensure_grid_numbering(
    mesh: Mesh, L: float = 1.0, H: float = 1.0, tol: float = 1e-6
) -> tuple[Mesh, "Gridified | None"]:
    """(mesh, gridified?) — renumber unless the numbering already fits.

    Pass-through (None second element) for pad_hole generated meshes whose
    numbering is already grid-structured."""
    if grid_numbering_ok(mesh):
        return mesh, None
    g = gridify_mesh(mesh, L=L, H=H, tol=tol)
    return g.mesh, g

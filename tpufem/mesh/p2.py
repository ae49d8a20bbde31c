"""P1 → P2 mesh refinement: edge-midpoint nodes for Taylor–Hood.

The reference bought exactly one P2 mesh from Triangle (``mesh2.2``,
``/root/reference/resources/mesh2.2.ele`` header ``450 6 0``) and has no
way to produce more.  This generates the P2 connectivity for ANY P1 mesh
in-process — the missing piece for running the LBB-stable Taylor–Hood
solvers (``workloads/navier_stokes.py``) on generated annulus meshes of
arbitrary size (the convergence-study reference solutions and the
sparse transient-TH path).

Triangle's P2 node order is preserved: corners 1–3, then midpoints
*opposite* each corner (midpoint k between corners k+1, k+2) — the order
``_th_element_matrices`` assumes.

Midpoint markers: a midpoint inherits marker m > 0 only when its edge is
a BOUNDARY edge (incident to exactly one triangle) and both endpoints
carry m — interior chords between two boundary nodes stay unmarked.
``snap_center``/``snap_radius`` optionally project inner-circle midpoints
onto the circle (the generated ring nodes sit exactly on radius r; the
chord midpoint otherwise lies at r·cos(π/n_circle) inside it).
"""

from __future__ import annotations

import numpy as np

from tpufem.mesh.core import Mesh, mesh_from_arrays

_P2_PAIRS = [(1, 2), (2, 0), (0, 1)]  # midpoint k is opposite corner k


def p2_refine(
    mesh: Mesh,
    inner_marker: int = 2,
    snap_center: tuple[float, float] | None = None,
    snap_radius: float = 0.0,
) -> Mesh:
    """A new Mesh whose ``tris_p2`` carries corners + edge midpoints."""
    tris = np.asarray(mesh.tris, dtype=np.int64)
    n = mesh.n_nodes
    t = tris.shape[0]

    # canonical edge keys (min, max) for the 3 edges opposite each corner
    ea = tris[:, [1, 2, 0]]
    eb = tris[:, [2, 0, 1]]
    lo = np.minimum(ea, eb)
    hi = np.maximum(ea, eb)
    key = lo * np.int64(n) + hi  # (T, 3)
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    inv = inv.reshape(t, 3)
    n_edges = len(uniq)
    elo, ehi = np.divmod(uniq, np.int64(n))

    mid = 0.5 * (mesh.coords[elo] + mesh.coords[ehi])
    on_boundary = counts == 1
    m_lo = mesh.markers[elo]
    m_hi = mesh.markers[ehi]
    mid_markers = np.where(
        on_boundary & (m_lo == m_hi) & (m_lo > 0), m_lo, 0
    ).astype(np.int32)

    if snap_center is not None and snap_radius > 0:
        sel = mid_markers == inner_marker
        d = mid[sel] - np.asarray(snap_center)
        r = np.hypot(d[:, 0], d[:, 1])
        mid[sel] = np.asarray(snap_center) + d * (snap_radius / r)[:, None]

    coords = np.concatenate([mesh.coords, mid], axis=0)
    markers = np.concatenate([mesh.markers, mid_markers])
    tris6 = np.concatenate([tris, n + inv], axis=1).astype(np.int32)
    return mesh_from_arrays(coords, tris6, markers, holes=mesh.holes)

"""Boundary conditions as data: index maps, masks, and value vectors.

The reference applies BCs with in-place Python loops and matrix "surgery"
(``/root/reference/code/StokesColor.py:169-221,405-431,471-479``,
``code/poisson.py:187-213``).  Here BCs are precomputed index arrays and
value vectors; application to fields is ``x.at[idx].set(v)`` (one fused
scatter) and application to matrices is a one-time functional transform at
setup.  Every variant the reference exercises is provided:

* periodic pair discovery (left/right columns, nearest-y matching),
* periodic enforcement: penalty (±1e10), master/slave row elimination,
  field copy, and DOF-merge relabeling (the CG-friendly exact form the
  penalty method approximates — SURVEY.md §7.3),
* Dirichlet row-only and symmetric row+column surgery,
* squirmer tangential slip, rotating-cylinder, pressure gauge fixing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpufem.mesh.core import Mesh

PENALTY = 1.0e10  # reference value, code/StokesColor.py:212


# ---------------------------------------------------------------------------
# Periodic pair discovery
# ---------------------------------------------------------------------------


def find_periodic_pairs(
    coords: np.ndarray,
    L: float = 1.0,
    H: float = 1.0,
    tol: float = 1e-6,
    exclude_walls: bool = True,
):
    """(masters, slaves) index arrays pairing x≈0 nodes with x≈L nodes.

    Vectorized equivalent of the KDTree search in
    ``code/StokesColor.py:169-203``: for each left node, the right node
    with nearest y becomes its slave.  ``exclude_walls`` drops pairs whose
    master sits on y≈0 or y≈H (the corner filter at
    ``code/StokesColor.py:449-457``).
    """
    coords = np.asarray(coords)
    left = np.nonzero(np.abs(coords[:, 0]) < tol)[0]
    right = np.nonzero(np.abs(coords[:, 0] - L) < tol)[0]
    if len(left) == 0 or len(right) == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    dy = np.abs(coords[left, 1][:, None] - coords[right, 1][None, :])
    slaves = right[np.argmin(dy, axis=1)]
    masters = left
    if exclude_walls:
        my = coords[masters, 1]
        keep = ~((np.abs(my - 0.0) < tol) | (np.abs(my - H) < tol))
        masters, slaves = masters[keep], slaves[keep]
    return masters.astype(np.int32), slaves.astype(np.int32)


# ---------------------------------------------------------------------------
# Field-level application (pure, jittable)
# ---------------------------------------------------------------------------


def apply_periodic_field(u: jnp.ndarray, masters, slaves) -> jnp.ndarray:
    """u[slave] ← u[master]  (``makePerBCU``, code/StokesColor.py:429-431)."""
    return u.at[jnp.asarray(slaves)].set(u[jnp.asarray(masters)])


def apply_dirichlet_field(u: jnp.ndarray, idx, values) -> jnp.ndarray:
    """u[idx] ← values (scalar or matching-shape array)."""
    return u.at[jnp.asarray(idx)].set(values)


# ---------------------------------------------------------------------------
# Matrix-level application (setup-time transforms; dense path)
# ---------------------------------------------------------------------------


def dirichlet_rows(A: jnp.ndarray, idx) -> jnp.ndarray:
    """Zero rows, unit diagonal (non-symmetric variant, poisson.py:271-273)."""
    idx = jnp.asarray(idx)
    A = A.at[idx, :].set(0.0)
    return A.at[idx, idx].set(1.0)


def dirichlet_rows_cols(A: jnp.ndarray, idx) -> jnp.ndarray:
    """Zero rows *and* columns, unit diagonal (StokesColor.py:472-475).

    Note: like the reference, the eliminated column is NOT lifted into the
    RHS — boundary values re-enter only through the RHS entries at the
    boundary rows themselves plus the per-step field re-application.
    """
    idx = jnp.asarray(idx)
    A = A.at[idx, :].set(0.0)
    A = A.at[:, idx].set(0.0)
    return A.at[idx, idx].set(1.0)


def periodic_penalty(A: jnp.ndarray, masters, slaves, penalty: float = PENALTY):
    """Symmetric penalty coupling (code/StokesColor.py:206-221)."""
    m = jnp.asarray(masters)
    s = jnp.asarray(slaves)
    A = A.at[m, m].add(penalty)
    A = A.at[s, s].add(penalty)
    A = A.at[m, s].add(-penalty)
    A = A.at[s, m].add(-penalty)
    return A


def periodic_elimination(A: jnp.ndarray, b: jnp.ndarray, masters, slaves):
    """Master/slave row elimination (code/poisson.py:187-213).

    Adds each slave row into its master row, then replaces the slave row by
    the constraint x_s − x_m = 0.  Processed *sequentially* like the
    reference: the nearest-y matching is not always injective (on mesh2.1
    two left nodes share a right partner), and in that case later pairs see
    the already-rewritten slave row.  Setup-time host computation.
    """
    A_np = np.asarray(A).copy()
    b_np = np.asarray(b).copy()
    for m, s in zip(np.asarray(masters), np.asarray(slaves)):
        A_np[m, :] += A_np[s, :]
        b_np[m] += b_np[s]
        A_np[s, :] = 0.0
        A_np[s, s] = 1.0
        A_np[s, m] = -1.0
        b_np[s] = 0.0
    return jnp.asarray(A_np, dtype=A.dtype), jnp.asarray(b_np, dtype=b.dtype)


def bc_surgery_csr(K, masters, slaves, dirichlet, b=None):
    """Row-only BC surgery on a CSROperator — the matrix-free twin of
    :func:`periodic_elimination` + :func:`dirichlet_rows` (the exact
    operator the dense Poisson/heat parity path factors,
    ``code/poisson.py:187-213`` + ``:271-273``), O(nnz) host work.

    Injective periodic matching required (generated meshes guarantee it;
    ``mesh2.1``'s duplicated pair needs the dense path's sequential
    semantics — asserted here rather than silently diverging).

    Returns ``(K_mod, b_mod)``: master rows summed with their slave rows,
    slave rows replaced by the constraint x_s − x_m = 0, Dirichlet rows
    replaced by identity (values enter via the caller's RHS entries).
    ``b`` (optional) gets the matching row treatment."""
    from tpufem.ops.sparse import csr_from_coo

    masters = np.asarray(masters, dtype=np.int64)
    slaves = np.asarray(slaves, dtype=np.int64)
    dirichlet = np.asarray(dirichlet, dtype=np.int64)
    assert len(np.unique(slaves)) == len(slaves), (
        "bc_surgery_csr requires injective periodic matching "
        "(use the dense path for meshes with duplicated pairs)"
    )
    n = K.shape[0]
    rows = np.asarray(K.row_ids, dtype=np.int64)
    cols = np.asarray(K.indices, dtype=np.int64)
    data = np.asarray(K.data, dtype=np.float64)

    master_of = np.full(n, -1, dtype=np.int64)
    master_of[slaves] = masters
    is_slave = np.zeros(n, dtype=bool)
    is_slave[slaves] = True
    is_diri = np.zeros(n, dtype=bool)
    is_diri[dirichlet] = True

    # A[m, :] += A[s, :]  (skip masters that are later Dirichlet-zeroed)
    sel = is_slave[rows]
    add_rows = master_of[rows[sel]]
    keep_add = ~is_diri[add_rows]
    extra = (add_rows[keep_add], cols[sel][keep_add], data[sel][keep_add])

    # original rows survive unless slave or Dirichlet
    keep = ~(is_slave[rows] | is_diri[rows])

    # constraint rows x_s − x_m = 0 (Dirichlet wins on overlap, matching
    # the dense call order: elimination first, dirichlet_rows after)
    cs = slaves[~is_diri[slaves]]
    cm = master_of[cs]
    ones = np.ones(len(cs))

    all_rows = np.concatenate(
        [rows[keep], extra[0], cs, cs, dirichlet]
    )
    all_cols = np.concatenate(
        [cols[keep], extra[1], cs, cm, dirichlet]
    )
    all_data = np.concatenate(
        [data[keep], extra[2], ones, -ones, np.ones(len(dirichlet))]
    )
    K_mod = csr_from_coo(all_rows, all_cols, all_data, (n, n),
                         sum_duplicates=True)
    if b is None:
        return K_mod, None
    b_np = np.asarray(b).copy()
    np.add.at(b_np, masters, b_np[slaves])  # repeated masters accumulate
    b_np[slaves] = 0.0
    return K_mod, jnp.asarray(b_np, dtype=b.dtype)


def periodic_relabel_tris(tris: np.ndarray, masters, slaves) -> np.ndarray:
    """DOF-merge: rewrite slave node ids to their masters in connectivity.

    Assembling on the relabeled connectivity yields an *exactly* periodic,
    symmetric operator — the conditioning-safe replacement for the ±1e10
    penalty, required by the CG solve path (SURVEY.md §7.3).
    """
    remap = np.arange(tris.max() + 1, dtype=np.int32)
    remap[np.asarray(slaves)] = np.asarray(masters)
    return remap[tris]


# ---------------------------------------------------------------------------
# Physical boundary-value generators
# ---------------------------------------------------------------------------


def squirmer_values(
    coords: np.ndarray,
    idx: np.ndarray,
    center=(0.5, 0.5),
    B1: float = -2.0,
    B2: float = 0.0,
) -> np.ndarray:
    """(k, 2) squirmer surface velocities for nodes ``idx``.

    v_t(θ) = B1 sinθ + B2 sin2θ, directed along the unit tangent
    (−sinθ, cosθ) — the microswimmer model of
    ``code/StokesColor.py:405-427``.  B2 < 0 pusher, > 0 puller, 0 neutral.
    """
    p = np.asarray(coords)[np.asarray(idx)]
    theta = np.arctan2(p[:, 1] - center[1], p[:, 0] - center[0])
    v_t = B1 * np.sin(theta) + B2 * np.sin(2.0 * theta)
    return np.stack([v_t * -np.sin(theta), v_t * np.cos(theta)], axis=1)


def rotating_cylinder_values(
    coords: np.ndarray, idx: np.ndarray, center=(0.5, 0.5), omega: float = 5.0
) -> np.ndarray:
    """(k, 2) solid-rotation surface velocities ω·(−r_y, r_x).

    Cf. ``scripts/stokes_clean_for_report.py:488-504`` (the linear ramp is
    applied by the caller as a per-step scale factor).
    """
    p = np.asarray(coords)[np.asarray(idx)]
    rx = p[:, 0] - center[0]
    ry = p[:, 1] - center[1]
    return omega * np.stack([-ry, rx], axis=1)


# ---------------------------------------------------------------------------
# Standard boundary decomposition for the channel/squirmer workloads
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ChannelBoundary:
    """Index sets for the reference's periodic-channel-with-inner-body setup.

    walls:      nodes with y≈0 or y≈H   (Dirichlet)
    inner:      nodes with the inner-body marker (Dirichlet, e.g. squirmer)
    dirichlet:  union of the above
    interior:   complement of dirichlet
    masters / slaves: periodic x-pairs (wall pairs excluded)
    """

    walls: np.ndarray
    inner: np.ndarray
    dirichlet: np.ndarray
    interior: np.ndarray
    masters: np.ndarray
    slaves: np.ndarray

    @classmethod
    def build(
        cls,
        mesh: Mesh,
        inner_marker: int = 2,
        L: float = 1.0,
        H: float = 1.0,
        tol: float = 1e-6,
        periodic: bool = True,
        all_walls: bool = False,
    ) -> "ChannelBoundary":
        """``all_walls=True`` makes every non-inner marked node a Dirichlet
        wall and disables periodicity — the enclosed-box configuration of
        the reference's ``scripts/stokes_flow.py`` family."""
        coords = mesh.coords
        walls = np.nonzero(
            np.isclose(coords[:, 1], 0.0, atol=tol) | np.isclose(coords[:, 1], H, atol=tol)
        )[0].astype(np.int32)
        inner = np.nonzero(mesh.markers == inner_marker)[0].astype(np.int32)
        if all_walls:
            periodic = False
            marked = np.nonzero(mesh.markers != 0)[0].astype(np.int32)
            walls = np.setdiff1d(marked, inner).astype(np.int32)
        dirichlet = np.union1d(walls, inner).astype(np.int32)
        interior = np.setdiff1d(np.arange(mesh.n_nodes, dtype=np.int32), dirichlet)
        if periodic:
            masters, slaves = find_periodic_pairs(coords, L=L, H=H, tol=tol)
        else:
            masters = np.zeros(0, np.int32)
            slaves = np.zeros(0, np.int32)
        return cls(walls, inner, dirichlet, interior, masters, slaves)

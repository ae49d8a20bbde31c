"""Diagnostics: preflight mesh checks, operator verification, run guards.

The reference's verification idioms (SURVEY.md §4) promoted to reusable,
assertable functions — its "Tests A–J" (``/root/reference/scripts/
stokes_report.py:343-808``), preflight mesh-quality/CFL/orientation checks
(``:856-895``), eigenvalue sanity (``:950-958``), and the per-step
divergence/NaN blow-up guards that served as its de-facto failure detector.
pytest wraps these in ``tests/test_diag.py``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpufem.mesh.core import Mesh
from tpufem.ops import assembly, calculus


# ---------------------------------------------------------------------------
# Preflight checks
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class MeshQualityReport:
    min_area: float
    max_area: float
    avg_area: float
    min_edge: float
    n_degenerate: int
    n_cw: int  # clockwise-oriented (negative signed det) triangles
    ok: bool

    def viscous_cfl_dt(self, nu: float) -> float:
        """Advisory stable dt ≈ min_edge² / (4ν) (stokes_report.py:874-878)."""
        return self.min_edge**2 / (4.0 * nu) if nu > 0 else float("inf")


def preflight(mesh: Mesh, area_warn: float = 1e-10) -> MeshQualityReport:
    """Mesh quality + orientation census (stokes_report.py:856-895)."""
    pc = mesh.coords[mesh.tris]
    e01 = np.linalg.norm(pc[:, 0] - pc[:, 1], axis=1)
    e12 = np.linalg.norm(pc[:, 1] - pc[:, 2], axis=1)
    e20 = np.linalg.norm(pc[:, 2] - pc[:, 0], axis=1)
    min_edge = float(np.min([e01.min(), e12.min(), e20.min()]))
    n_cw = int(np.sum(mesh.det < 0))
    n_deg = int(np.sum(~mesh.valid))
    return MeshQualityReport(
        min_area=float(mesh.area.min()),
        max_area=float(mesh.area.max()),
        avg_area=float(mesh.area.mean()),
        min_edge=min_edge,
        n_degenerate=n_deg,
        n_cw=n_cw,
        ok=(mesh.area.min() > area_warn) and n_deg == 0,
    )


def pressure_matrix_eigen_check(A: jnp.ndarray, n_negative_tol: int = 1):
    """Eigenvalue sign census of the pressure operator
    (stokes_report.py:950-958).  Returns (min_eig, max_eig, n_negative)."""
    eig = np.linalg.eigvalsh(np.asarray(0.5 * (A + A.T)))
    return float(eig.min()), float(eig.max()), int(np.sum(eig < -1e-10))


# ---------------------------------------------------------------------------
# Operator verification (the reference's analytic-field tests)
# ---------------------------------------------------------------------------


def gradient_test(mesh: Mesh):
    """Test: p = 2x + 3y ⇒ ∇p = (2, 3) (stokes_report.py:388-407).
    Returns the mean nodal gradient (should be ≈ (2, 3))."""
    coords = jnp.asarray(mesh.coords)
    p = 2.0 * coords[:, 0] + 3.0 * coords[:, 1]
    g = calculus.gradient(mesh, p)
    return jnp.mean(g, axis=0)


def divergence_test(mesh: Mesh):
    """Test: u = (2x, 3y) ⇒ div u = 5 (stokes_report.py:410-431).
    Returns the mean nodal divergence (should be ≈ 5)."""
    coords = jnp.asarray(mesh.coords)
    u = jnp.stack([2.0 * coords[:, 0], 3.0 * coords[:, 1]], axis=1)
    return jnp.mean(calculus.divergence(mesh, u))


def adjointness_test(mesh: Mesh, seed: int = 0):
    """⟨∇p, u⟩_M ≈ −⟨p, ∇·u⟩_M with lumped-mass inner products on random
    fields zeroed on the boundary (stokes_report.py:532-591).
    Returns the relative mismatch."""
    rng = np.random.default_rng(seed)
    n = mesh.n_nodes
    boundary = mesh.markers != 0
    p = rng.standard_normal(n)
    u = rng.standard_normal((n, 2))
    p[boundary] = 0.0
    u[boundary] = 0.0
    p = jnp.asarray(p)
    u = jnp.asarray(u)
    mass = assembly.lumped_mass(mesh)
    g = calculus.gradient(mesh, p)
    d = calculus.divergence(mesh, u)
    lhs = jnp.sum(mass * jnp.sum(g * u, axis=1))
    rhs = -jnp.sum(mass * p * d)
    return jnp.abs(lhs - rhs) / (jnp.abs(rhs) + 1e-30)


def laplacian_vs_divgrad_test(mesh: Mesh, sigma: float = 0.1):
    """Pearson correlation between K p (FEM Laplacian, mass-normalized) and
    −div(grad p) on a Gaussian blob (stokes_report.py:482-529)."""
    coords = np.asarray(mesh.coords)
    p = np.exp(
        -((coords[:, 0] - 0.5) ** 2 + (coords[:, 1] - 0.5) ** 2) / (2 * sigma**2)
    )
    p = jnp.asarray(p)
    K = assembly.assemble_dense(mesh, assembly.element_stiffness(mesh))
    mass = assembly.lumped_mass(mesh)
    lap_fem = (K @ p) / (mass + 1e-12)
    g = calculus.gradient(mesh, p)
    lap_composed = -calculus.divergence(mesh, g)
    interior = np.asarray(mesh.markers) == 0
    a = np.asarray(lap_fem)[interior]  # K p / M_L ≈ −∇²p
    b = np.asarray(lap_composed)[interior]  # −div(grad p) ≈ −∇²p
    return float(np.corrcoef(a, b)[0, 1])


def checkerboard_response(mesh: Mesh):
    """LBB probe: lumped divergence magnitude of a ±1 checkerboard velocity
    (stokes_report.py:343-385).  Near-zero response ⇒ the projection is
    blind to this mode (the reference's known accuracy limiter)."""
    rng = np.random.default_rng(0)
    sign = np.where(rng.integers(0, 2, mesh.n_nodes) > 0, 1.0, -1.0)
    u = jnp.asarray(np.stack([sign, -sign], axis=1))
    return jnp.max(jnp.abs(calculus.divergence(mesh, u)))


def checkerboard_field(mesh: Mesh, seed: int = 0) -> np.ndarray:
    """A ±1 'checkerboard' nodal field (random-sign proxy, like the
    reference's probes — no structured 2-coloring exists on an
    unstructured mesh)."""
    rng = np.random.default_rng(seed)
    return np.where(rng.integers(0, 2, mesh.n_nodes) > 0, 1.0, -1.0)


def laplacian_blind_spot_test(mesh: Mesh):
    """Response norm of the pressure Laplacian to a checkerboard pressure
    (stokes_report.py:593-637).  A near-zero response means that mode
    lives in the operator's numerical nullspace (LBB instability) and will
    pollute the pressure unopposed.  Returns ‖K c‖ / ‖c‖."""
    c = jnp.asarray(checkerboard_field(mesh))
    K = assembly.assemble_dense(mesh, assembly.element_stiffness(mesh))
    return jnp.linalg.norm(K @ c) / jnp.linalg.norm(c)


def gradient_of_checkerboard_test(mesh: Mesh):
    """Magnitude of the lumped gradient of a checkerboard pressure
    (stokes_report.py:639-673): if ≈ 0 the velocity correction cannot see
    checkerboard pressure — the projection's blind spot."""
    c = jnp.asarray(checkerboard_field(mesh))
    g = calculus.gradient(mesh, c)
    return jnp.mean(jnp.linalg.norm(g, axis=1))


def projection_consistency_test(mesh: Mesh, seed: int = 0):
    """Correlation between the lumped-divergence RHS and the consistent
    (weak) RHS −∫∇φ·u on a random velocity (stokes_report.py:434-479).
    High correlation ⇒ the two discrete routes agree."""
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal((mesh.n_nodes, 2)))
    mass = assembly.lumped_mass(mesh)
    lumped_rhs = np.asarray(calculus.divergence(mesh, u) * mass)
    # −∫∇φ·u = +∫φ (∇·u) by parts (interior) — already the weak divergence
    consistent_rhs = np.asarray(calculus.consistent_divergence_rhs(mesh, u))
    interior = np.asarray(mesh.markers) == 0
    return float(np.corrcoef(lumped_rhs[interior], consistent_rhs[interior])[0, 1])


def rhs_handling_test(mesh: Mesh, value: float = 1.5):
    """A/B comparison of Dirichlet handling (stokes_report.py:675-734,
    the reference's Test H): the 'corrected' method writes target values
    into the RHS of the identity-row system; the flawed method solves with
    stale RHS entries and relies on post-hoc overwriting.  Returns the max
    deviation of the corrected solve's boundary values from the target
    (should be exactly 0)."""
    from tpufem import bc as bc_mod
    from tpufem.solve import make_dense_solver

    boundary = bc_mod.ChannelBoundary.build(mesh)
    K = assembly.assemble_dense(mesh, assembly.element_stiffness(mesh))
    A = jnp.eye(mesh.n_nodes, dtype=K.dtype) + 0.01 * K
    A = bc_mod.dirichlet_rows_cols(A, boundary.dirichlet)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal(mesh.n_nodes))
    rhs = rhs.at[jnp.asarray(boundary.dirichlet)].set(value)  # corrected method
    x = make_dense_solver(A).solve(rhs)
    return float(jnp.max(jnp.abs(x[jnp.asarray(boundary.dirichlet)] - value)))


def single_step_diagnostics(problem, u0=None):
    """One projection step broken into stages with per-stage divergence —
    the reference's u*/pressure single-step diagnostics
    (stokes_report.py:736-808).  Returns a dict of stage observables."""
    import jax.numpy as jnp

    from tpufem.workloads import stokes

    if u0 is None:
        u0 = stokes.initial_state(problem)["u"]
    dt = problem.config.dt
    u_star = problem.visc_solver.solve(u0)
    u_star = stokes.apply_field_bcs(problem, u_star)
    div_star = problem.div(u_star)
    p = problem.pressure_solver.solve(-div_star / dt)
    u1 = u_star - dt * problem.grad(p)
    return {
        "max_u_star": float(jnp.max(jnp.abs(u_star))),
        "div_star_max": float(jnp.max(jnp.abs(div_star))),
        "max_p": float(jnp.max(jnp.abs(p))),
        "div_after_max": float(jnp.max(jnp.abs(problem.div(u1)))),
    }


def projection_reduces_divergence(step_results: dict) -> bool:
    """Single-step projection oracle (scripts/test2.py, final_test.py):
    after a projection step the divergence must drop substantially."""
    return step_results["final_div"] < 0.5 * step_results["initial_div"]


# ---------------------------------------------------------------------------
# Run-time guards (the numerical "sanitizers")
# ---------------------------------------------------------------------------


def blowup_guard(u: jnp.ndarray, max_mag: float = 1e3) -> jnp.ndarray:
    """True if the field is finite and bounded — the functional analog of the
    reference's printed Max-U / Final-Div blow-up watching (SURVEY.md §5)."""
    return jnp.isfinite(u).all() & (jnp.max(jnp.abs(u)) < max_mag)


def run_guarded(
    problem,
    total_steps: int,
    chunk: int = 100,
    max_mag: float = 1e3,
    max_div: float | None = None,
    state: dict | None = None,
):
    """Failure-detecting driver: run in chunks, abort on blow-up.

    The automated replacement for the reference's human watching printed
    ``Final Div(u)`` for explosions (SURVEY.md §5, failure detection).
    Aborts *before* accepting a chunk whose end state is non-finite,
    unbounded, or (optionally) whose divergence exceeds ``max_div`` —
    returning the last good state.

    Returns (state, report) with report = {status, completed_steps, reason}.
    """
    from tpufem.workloads import stokes

    if state is None:
        state = stokes.initial_state(problem)
    done = 0
    while done < total_steps:
        c = min(chunk, total_steps - done)
        new_state, metrics = stokes.run(problem, steps=c, state=state)
        reason = None
        if not bool(blowup_guard(new_state["u"], max_mag)):
            reason = f"velocity non-finite or |u| ≥ {max_mag}"
        elif max_div is not None:
            worst = float(np.asarray(metrics["final_div_max"]).max())
            if not np.isfinite(worst) or worst > max_div:
                reason = f"divergence {worst:.3e} > {max_div:.3e}"
        if reason is not None:
            return state, {
                "status": "aborted",
                "completed_steps": done,
                "reason": reason,
            }
        state = new_state
        done += c
    return state, {"status": "ok", "completed_steps": done, "reason": None}

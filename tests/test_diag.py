"""The reference's verification suite (Tests A–J) as pytest (SURVEY §4)."""

import numpy as np
import pytest

from tpufem import diag
from tpufem.ops import assembly
from tpufem.workloads import stokes


def test_preflight_reference_mesh(mesh1):
    rep = diag.preflight(mesh1)
    assert rep.ok
    assert rep.n_degenerate == 0
    assert rep.min_area > 1e-6
    assert rep.viscous_cfl_dt(0.1) > 0


def test_gradient_analytic(mesh1, gen_mesh):
    """p = 2x+3y ⇒ mean ∇p ≈ (2,3) (stokes_report.py:388-407, tol 0.1)."""
    for m in (mesh1, gen_mesh):
        g = np.asarray(diag.gradient_test(m))
        np.testing.assert_allclose(g, [2.0, 3.0], atol=0.1)


def test_divergence_analytic(mesh1, gen_mesh):
    """u = (2x,3y) ⇒ mean div ≈ 5 (stokes_report.py:410-431)."""
    for m in (mesh1, gen_mesh):
        assert abs(float(diag.divergence_test(m)) - 5.0) < 0.1


def test_adjointness(mesh1):
    """⟨∇p,u⟩ ≈ −⟨p,∇·u⟩, rel err < 1e-6 (stokes_report.py:532-591)."""
    assert float(diag.adjointness_test(mesh1)) < 1e-6


def test_laplacian_vs_divgrad(mesh1):
    """FEM Laplacian correlates with composed −div∘grad
    (stokes_report.py:482-529)."""
    assert diag.laplacian_vs_divgrad_test(mesh1) > 0.9


def test_checkerboard_response(mesh1):
    """The lumped divergence does respond to a random ±1 field — zero
    response would mean the projection is blind (stokes_report.py:343-385)."""
    assert float(diag.checkerboard_response(mesh1)) > 1.0


def test_pressure_matrix_spd(mesh1):
    """Merged pressure operator (symmetrized) has no negative eigenvalues
    beyond the nullspace (stokes_report.py:950-958 analog)."""
    import jax.numpy as jnp

    K = assembly.assemble_dense(mesh1, assembly.element_stiffness(mesh1))
    mn, mx, n_neg = diag.pressure_matrix_eigen_check(K)
    assert n_neg == 0
    assert mx > 0


def test_single_step_projection_reduces_divergence(mesh1):
    """A bare pressure-projection on u*=(x,y) (div=2) cuts the interior
    divergence — the standalone verifier of scripts/test2.py:161-238."""
    import jax.numpy as jnp

    problem = stokes.StokesProblem.build(
        mesh1, stokes.StokesConfig(dt=0.01, pressure_mode="merge", transport="none")
    )
    coords = jnp.asarray(mesh1.coords)
    # compatible field (zero net flux over the periodic box): div = 2π cos 2πx
    u0 = jnp.stack(
        [jnp.sin(2 * jnp.pi * coords[:, 0]), jnp.zeros(mesh1.n_nodes)], axis=1
    )
    dt = problem.config.dt
    interior = np.asarray(mesh1.markers) == 0
    d0 = problem.div(u0)
    p = problem.pressure_solver.solve(-d0 / dt)
    u1 = u0 - dt * problem.grad(p)
    d1 = problem.div(u1)
    initial = float(jnp.mean(jnp.abs(d0[interior])))
    final = float(jnp.mean(jnp.abs(d1[interior])))
    assert diag.projection_reduces_divergence(
        {"initial_div": initial, "final_div": final}
    )


def test_laplacian_blind_spot(mesh1):
    """The stiffness operator must respond to checkerboard pressure — a
    vanishing response would mean unopposed checkerboard modes."""
    assert float(diag.laplacian_blind_spot_test(mesh1)) > 1.0


def test_gradient_of_checkerboard(mesh1):
    """The lumped gradient partially smooths checkerboards (its response
    is much smaller than for a smooth unit-gradient field — the documented
    origin of the reference's checkerboarding artifacts) but is nonzero."""
    g = float(diag.gradient_of_checkerboard_test(mesh1))
    assert g > 0.1  # not blind


def test_projection_consistency(mesh1):
    assert diag.projection_consistency_test(mesh1) > 0.9


def test_rhs_handling(mesh1):
    """Corrected Dirichlet-in-RHS method reproduces targets exactly."""
    assert diag.rhs_handling_test(mesh1) < 1e-12


def test_single_step_diagnostics(mesh1):
    problem = stokes.StokesProblem.build(
        mesh1, stokes.StokesConfig(pressure_mode="merge")
    )
    d = diag.single_step_diagnostics(problem)
    assert d["max_u_star"] > 0 and np.isfinite(d["max_p"])
    assert d["div_after_max"] < d["div_star_max"]


def test_operator_properties_on_jittered_mesh():
    """Robustness: the discrete-calculus identities hold on an irregular
    (jittered-node) generated mesh, not just the bundled ones."""
    import tpufem

    m = tpufem.generate_annulus_mesh(n_side=24, n_circle=28, jitter=0.25, seed=3)
    assert m.valid.all()
    g = np.asarray(diag.gradient_test(m))
    np.testing.assert_allclose(g, [2.0, 3.0], atol=0.1)
    assert abs(float(diag.divergence_test(m)) - 5.0) < 0.1
    assert float(diag.adjointness_test(m)) < 1e-6
    # the lumped −div∘grad composition drifts from the FEM Laplacian on
    # irregular elements (the accuracy limitation the reference's report
    # itself documents) — correlation degrades but must stay substantial
    assert diag.laplacian_vs_divgrad_test(m) > 0.5


def test_blowup_guard():
    import jax.numpy as jnp

    assert bool(diag.blowup_guard(jnp.ones((5, 2))))
    assert not bool(diag.blowup_guard(jnp.full((5, 2), jnp.nan)))
    assert not bool(diag.blowup_guard(jnp.full((5, 2), 1e9)))

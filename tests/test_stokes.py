"""Stokes projection workload: parity vs the NumPy oracle + behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from baselines import numpy_ref
from tpufem.workloads import stokes


@pytest.fixture(scope="module")
def problem(mesh1):
    return stokes.StokesProblem.build(mesh1, stokes.StokesConfig())


def test_stokes_parity_5_steps(mesh1, problem):
    """Velocity field matches the reference algorithm after 5 steps."""
    ref = numpy_ref.StokesRef(mesh1.coords, mesh1.tris, mesh1.markers, dt=0.05, nu=0.1)
    u_ref = ref.initial_state()
    metrics_ref = None
    for _ in range(5):
        u_ref, metrics_ref = ref.step(u_ref)

    state, metrics = stokes.run(problem, steps=5)
    u = np.asarray(state["u"])
    err = np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-6, f"relative L2 error {err}"
    np.testing.assert_allclose(
        float(metrics["div_star_max"][-1]), metrics_ref["div_star"], rtol=1e-4
    )
    np.testing.assert_allclose(
        float(metrics["final_div_max"][-1]), metrics_ref["final_div"], rtol=1e-3
    )


def test_stokes_parity_50_steps_long(mesh1, problem):
    """Long-horizon parity: 50 reference-algorithm steps, rel err ~1e-9
    (errors do not compound beyond roundoff — the dynamics are identical)."""
    ref = numpy_ref.StokesRef(mesh1.coords, mesh1.tris, mesh1.markers, dt=0.05, nu=0.1)
    u_ref = ref.initial_state()
    for _ in range(50):
        u_ref, m_ref = ref.step(u_ref)
    state, metrics = stokes.run(problem, steps=50)
    err = np.linalg.norm(np.asarray(state["u"]) - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-6, err
    np.testing.assert_allclose(
        float(metrics["final_div_max"][-1]), m_ref["final_div"], rtol=1e-5
    )


def test_projection_reduces_divergence(problem):
    """The projection must substantially reduce divergence each step
    (the reference's de-facto regression oracle, SURVEY.md §4.4)."""
    state, metrics = stokes.run(problem, steps=10)
    div_star = np.asarray(metrics["div_star_max"])
    final_div = np.asarray(metrics["final_div_max"])
    assert (final_div < div_star).all()
    assert np.isfinite(np.asarray(state["u"])).all()


def test_squirmer_bc_enforced(mesh1, problem):
    state, _ = stokes.run(problem, steps=3)
    u = np.asarray(state["u"])
    b = problem.boundary
    np.testing.assert_allclose(u[b.walls], 0.0, atol=1e-12)
    np.testing.assert_allclose(u[b.inner], problem.inner_values, atol=1e-12)
    # squirmer magnitude = |B1 sinθ + B2 sin2θ| ≤ |B1|+|B2|
    mags = np.linalg.norm(u[b.inner], axis=1)
    assert mags.max() <= abs(problem.config.B1) + abs(problem.config.B2) + 1e-9


def test_stokes_dye_mixing_progresses(mesh1):
    cfg = stokes.StokesConfig(transport="dye", steps=30)
    problem = stokes.StokesProblem.build(mesh1, cfg)
    state, metrics = stokes.run(problem)
    prog = np.asarray(metrics["mixing_progress"])
    c = np.asarray(state["c"])
    assert np.isfinite(prog).all()
    assert prog[-1] > 0.0  # squirmer stirring mixes the dye
    assert c.min() >= -1e-6 and c.max() <= 1.0 + 1e-6


def test_stokes_food_capture(mesh1):
    """Food-capture run (StokesFood config: ν=1, dt=0.01): eaten count is
    monotone and some tracers are captured by the swimming squirmer."""
    cfg = stokes.StokesConfig(
        dt=0.01, nu=1.0, transport="tracers", steps=50, tracer_density=15
    )
    problem = stokes.StokesProblem.build(mesh1, cfg)
    state, metrics = stokes.run(problem)
    eaten = np.asarray(metrics["eaten"])
    assert (np.diff(eaten) >= 0).all()  # eaten stays eaten
    assert eaten[-1] > 0
    pts = np.asarray(state["tracers"])
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] <= 1.0).all()  # x-wrapped


def test_food_capture_mesh_fine(mesh_fine):
    """BASELINE config 5: the food-capture pipeline on the benchmark mesh
    (mesh_fine, 1067 nodes) runs finite with monotone capture stats."""
    cfg = stokes.StokesConfig(
        dt=0.01, nu=1.0, transport="tracers", tracer_density=20,
        pressure_mode="merge",
    )
    problem = stokes.StokesProblem.build(mesh_fine, cfg)
    state, metrics = stokes.run(problem, steps=20)
    eaten = np.asarray(metrics["eaten"])
    assert (np.diff(eaten) >= 0).all()
    assert np.isfinite(np.asarray(state["u"])).all()


def test_rotating_cylinder_with_ramp(mesh1):
    cfg = stokes.StokesConfig(bc_kind="rotating", omega=5.0, ramp_steps=10, dt=1e-3)
    problem = stokes.StokesProblem.build(mesh1, cfg)
    state, metrics = stokes.run(problem, steps=12)
    assert np.isfinite(np.asarray(state["u"])).all()
    # after the ramp the inner-boundary speed reaches ω·r = 5·0.25
    u = np.asarray(state["u"])
    mags = np.linalg.norm(u[problem.boundary.inner], axis=1)
    np.testing.assert_allclose(mags, 5.0 * 0.25, rtol=1e-6)


def test_all_walls_enclosed_box(mesh1):
    """Enclosed-box Stokes (stokes_flow.py family): all marked nodes are
    no-slip walls, no periodicity — the squirmer still stirs the interior."""
    cfg = stokes.StokesConfig(all_walls=True, pressure_mode="merge")
    problem = stokes.StokesProblem.build(mesh1, cfg)
    assert len(problem.boundary.masters) == 0
    state, metrics = stokes.run(problem, steps=10)
    u = np.asarray(state["u"])
    np.testing.assert_allclose(u[problem.boundary.walls], 0.0, atol=1e-12)
    interior = mesh1.markers == 0
    assert np.abs(u[interior]).max() > 1e-3  # flow develops
    assert np.isfinite(u).all()


def test_single_vs_double_projection(mesh1):
    """The second projection exists to reduce divergence further —
    verify it does (cf. StokesColor.py:566 comment)."""
    one = stokes.StokesProblem.build(mesh1, stokes.StokesConfig(double_projection=False))
    two = stokes.StokesProblem.build(mesh1, stokes.StokesConfig(double_projection=True))
    _, m1 = stokes.run(one, steps=5)
    _, m2 = stokes.run(two, steps=5)
    assert float(m2["final_div_max"][-1]) < float(m1["final_div_max"][-1])

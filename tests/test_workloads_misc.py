"""Stam grid, advection–diffusion, graph-average workload tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem.workloads import advection_diffusion as ad
from tpufem.workloads import graph_average, stam_grid


# ---------------------------------------------------------------------------
# Stam structured-grid solver
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def stam_cfg():
    return stam_grid.StamConfig(size=64, inflow_radius=16, solver_iters=10)


def test_stam_run_develops_flow(stam_cfg):
    state, max_speed = stam_grid.run(stam_cfg, frames=30)
    d = np.asarray(state["density"])
    assert np.isfinite(d).all()
    assert d.max() > 0.5  # inflow dye present
    # dye has advected rightward past the jet columns
    assert d[:, 5:30].max() > 0.05
    assert np.isfinite(np.asarray(max_speed)).all()


def test_stam_obstacle_blocks_flow(stam_cfg):
    state, _ = stam_grid.run(stam_cfg, frames=20)
    # the last step applied the mask at t_before = t - dt
    mask = np.asarray(stam_grid.obstacle_mask(stam_cfg, state["t"] - stam_cfg.dt))
    # obstacle cells carry the reference's fixed 0.1 shade
    np.testing.assert_allclose(np.asarray(state["density"])[mask], 0.1, atol=1e-6)


def test_stam_projection_reduces_divergence(stam_cfg):
    state, _ = stam_grid.run(stam_cfg, frames=10)
    vx, vy = np.asarray(state["vx"]), np.asarray(state["vy"])
    div = (vx[1:-1, 2:] - vx[1:-1, :-2] + vy[2:, 1:-1] - vy[:-2, 1:-1]) * 0.5
    speed = np.hypot(vx, vy).max()
    assert np.abs(div).mean() < 0.2 * speed


def test_stam_boundaries():
    x = jnp.asarray(np.random.default_rng(0).random((8, 8)))
    # b=2 flips the top/bottom rows (vertical velocity)
    y = np.asarray(stam_grid.set_boundaries(2, x))
    np.testing.assert_allclose(y[0, 1:-1], -y[1, 1:-1])
    # right wall is zero-gradient for every b
    np.testing.assert_allclose(y[1:-1, -1], y[1:-1, -2])


# ---------------------------------------------------------------------------
# Advection–diffusion (mega_poisson)
# ---------------------------------------------------------------------------


def test_advection_diffusion_run(mesh21):
    problem = ad.ADProblem.build(mesh21, ad.ADConfig(steps=1000))
    f, maxf = ad.run(problem)
    f = np.asarray(f)
    m = np.asarray(maxf)
    assert np.isfinite(f).all()
    assert f.max() > 0.0
    # the scheme (central advection, no SUPG — reference behavior) is
    # oscillatory but stable: it reaches a bounded steady state
    assert abs(m[-1] - m[-200]) < 0.1 * abs(m[-1])
    assert m.max() < 100.0
    # Dirichlet boundaries stay at 0 after the solve
    np.testing.assert_allclose(f[mesh21.markers != 0], 0.0, atol=1e-10)


def test_advection_diffusion_advects_downstream(mesh21):
    """With c = (5,5), concentration downstream (up-right) of an injection
    exceeds the upstream side after a while."""
    problem = ad.ADProblem.build(
        mesh21,
        ad.ADConfig(steps=200, injections=(((0.2, 0.2), 10.0),), init_blobs=()),
    )
    f, _ = ad.run(problem)
    f = np.asarray(f)
    coords = mesh21.coords
    down = (coords[:, 0] > 0.25) & (coords[:, 0] < 0.45) & (coords[:, 1] > 0.25) & (coords[:, 1] < 0.45)
    up = (coords[:, 0] < 0.15) & (coords[:, 1] < 0.15)
    assert f[down].mean() > f[up].mean()


# ---------------------------------------------------------------------------
# Graph-average prototype (homemade_sim)
# ---------------------------------------------------------------------------


def test_graph_average(mesh1):
    f, residual = graph_average.solve(mesh1)
    f = np.asarray(f)
    assert float(residual) < 1e-10
    # harmonic interpolation: interior values between the boundary values
    assert f.min() >= -1e-12 and f.max() <= 1.0 + 1e-12
    # discrete mean-value property at interior nodes
    neigh = graph_average.neighbor_lists(mesh1)
    interior = np.nonzero(mesh1.markers == 0)[0]
    i = int(interior[5])
    np.testing.assert_allclose(f[i], np.mean(f[neigh[i]]), atol=1e-10)

"""Poisson workload parity vs the NumPy oracle (reference pipeline)."""

import numpy as np

from baselines import numpy_ref
from tpufem.workloads import poisson


def test_poisson_parity_mesh1(mesh1):
    f, residual = poisson.solve(mesh1)
    f_ref, A_ref, b_ref = numpy_ref.poisson_solve(mesh1.coords, mesh1.tris, mesh1.markers)
    assert float(residual) < 1e-8
    l2 = np.linalg.norm(np.asarray(f) - f_ref) / np.linalg.norm(f_ref)
    assert l2 < 1e-8


def test_poisson_parity_mesh21(mesh21):
    f, residual = poisson.solve(mesh21)
    f_ref, _, _ = numpy_ref.poisson_solve(mesh21.coords, mesh21.tris, mesh21.markers)
    l2 = np.linalg.norm(np.asarray(f) - f_ref) / np.linalg.norm(f_ref)
    assert l2 < 1e-8


def test_poisson_system_matches_oracle(mesh21):
    A, b, _ = poisson.build_system(mesh21)
    _, A_ref, b_ref = numpy_ref.poisson_solve(mesh21.coords, mesh21.tris, mesh21.markers)
    np.testing.assert_allclose(np.asarray(A), A_ref, atol=1e-9)
    np.testing.assert_allclose(np.asarray(b), b_ref, atol=1e-9)


def test_poisson_boundary_values_enforced(mesh1):
    f, _ = poisson.solve(mesh1)
    f = np.asarray(f)
    cfg = poisson.PoissonConfig()
    walls = np.isclose(mesh1.coords[:, 1], 0.0) | np.isclose(mesh1.coords[:, 1], 1.0)
    inner = mesh1.markers == cfg.inner_marker
    np.testing.assert_allclose(f[inner], cfg.inner_value, atol=1e-10)
    np.testing.assert_allclose(f[walls & ~inner], cfg.outer_value, atol=1e-10)


def test_poisson_periodicity(mesh1):
    from tpufem import bc

    f, _ = poisson.solve(mesh1)
    f = np.asarray(f)
    masters, slaves = bc.find_periodic_pairs(mesh1.coords)
    np.testing.assert_allclose(f[masters], f[slaves], atol=1e-9)


def test_poisson_generated_mesh(gen_mesh):
    """Standalone path: solve on a generated mesh, check residual + BCs."""
    f, residual = poisson.solve(gen_mesh)
    assert float(residual) < 1e-8
    assert np.isfinite(np.asarray(f)).all()

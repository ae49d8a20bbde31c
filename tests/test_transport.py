"""Point location, interpolation, advection, tracer, mixing tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpufem import transport


def _random_interior_points(mesh, n=200, seed=0):
    """Sample random points strictly inside mesh triangles (barycentric)."""
    rng = np.random.default_rng(seed)
    tid = rng.integers(0, mesh.n_tris, n)
    w = rng.dirichlet([2.0, 2.0, 2.0], size=n)  # away from edges
    pc = mesh.coords[mesh.tris[tid]]
    pts = np.einsum("pi,pid->pd", w, pc)
    return pts, tid


@pytest.fixture(scope="module", params=["topk", "grid"])
def locator(request, mesh1):
    if request.param == "topk":
        return transport.TopKLocator(mesh1, k=10)
    return transport.GridLocator.build(mesh1, g=16)


def test_locator_finds_containing_triangle(mesh1, locator):
    pts, _ = _random_interior_points(mesh1)
    tid, found = locator.find(jnp.asarray(pts))
    assert bool(jnp.all(found))
    # verify containment of the reported triangle
    tri_xy = mesh1.coords[mesh1.tris[np.asarray(tid)]]
    w, _ = transport._barycentric(jnp.asarray(tri_xy), jnp.asarray(pts))
    assert float(jnp.min(w)) >= -1e-12


def test_locator_rejects_points_in_hole(mesh1, locator):
    # points inside the cylinder (radius 0.25 around (0.5, 0.5))
    theta = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    pts = np.stack([0.5 + 0.1 * np.cos(theta), 0.5 + 0.1 * np.sin(theta)], axis=1)
    _, found = locator.find(jnp.asarray(pts))
    assert not bool(jnp.any(found))


def test_interpolate_linear_field_exact(mesh1, locator):
    """P1 interpolation reproduces linear fields exactly."""
    pts, _ = _random_interior_points(mesh1, seed=1)
    f = 2.0 * mesh1.coords[:, 0] + 3.0 * mesh1.coords[:, 1] + 1.0
    vals, found = transport.interpolate(mesh1, jnp.asarray(f), jnp.asarray(pts), locator)
    expected = 2.0 * pts[:, 0] + 3.0 * pts[:, 1] + 1.0
    np.testing.assert_allclose(np.asarray(vals), expected, atol=1e-10)


def test_interpolate_corner_gather_matches_triangle_major(mesh1, locator, monkeypatch):
    """The large-T corner-gather branch (O(P) row gathers off the packed
    locator rows, used above _TRI_MAJOR_MAX_TRIS) is value-identical to
    the small-T triangle-major re-pack."""
    pts, _ = _random_interior_points(mesh1, seed=7)
    rng = np.random.default_rng(7)
    f = jnp.asarray(rng.standard_normal((mesh1.n_nodes, 2)))
    v0, found0 = transport.interpolate(mesh1, f, jnp.asarray(pts), locator)
    monkeypatch.setattr(transport, "_TRI_MAJOR_MAX_TRIS", 0)
    v1, found1 = transport.interpolate(mesh1, f, jnp.asarray(pts), locator)
    assert bool(jnp.all(found0 == found1))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-12)


def test_advect_zero_velocity_identity(mesh1):
    """Zero velocity keeps the dye — except on the x≈L column, whose
    departure points wrap to x=0 and pick up the left partner's value
    (periodic wrap semantics of the reference, StokesColor.py:361)."""
    loc = transport.TopKLocator(mesh1, k=10)
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.random(mesh1.n_nodes))
    u = jnp.zeros((mesh1.n_nodes, 2))
    c2 = transport.advect_semilagrange(mesh1, loc, c, u, dt=0.05)
    not_right = ~np.isclose(mesh1.coords[:, 0], 1.0)
    np.testing.assert_allclose(
        np.asarray(c2)[not_right], np.asarray(c)[not_right], atol=1e-9
    )


def test_advect_uniform_flow_shifts_dye(mesh1):
    """Uniform +x flow advects the dye front to the right (mass increases
    on the left-half indicator after periodic wrap is bounded in [0,1])."""
    loc = transport.TopKLocator(mesh1, k=10)
    c = jnp.where(jnp.asarray(mesh1.coords[:, 0]) < 0.5, 1.0, 0.0)
    u = jnp.tile(jnp.asarray([1.0, 0.0]), (mesh1.n_nodes, 1))
    c2 = transport.advect_semilagrange(mesh1, loc, c, u, dt=0.1)
    # nodes just right of the front (0.5 < x < 0.6) should now hold dye
    x = mesh1.coords[:, 0]
    band = (x > 0.52) & (x < 0.58) & (mesh1.markers == 0)
    assert float(np.asarray(c2)[band].mean()) > 0.5
    assert float(jnp.min(c2)) >= -1e-9 and float(jnp.max(c2)) <= 1.0 + 1e-9


def test_tracer_uniform_flow_and_wrap(mesh1):
    loc = transport.TopKLocator(mesh1, k=10)
    pts = jnp.asarray([[0.98, 0.3], [0.2, 0.7]])
    u = jnp.tile(jnp.asarray([1.0, 0.0]), (mesh1.n_nodes, 1))
    new = transport.tracer_step(mesh1, loc, pts, u, dt=0.05)
    np.testing.assert_allclose(np.asarray(new[0]), [0.03, 0.3], atol=1e-9)  # wrapped
    np.testing.assert_allclose(np.asarray(new[1]), [0.25, 0.7], atol=1e-9)


def test_tracer_outside_mesh_stays(mesh1):
    """Points inside the hole sample zero velocity (masked like the
    reference's LinearTriInterpolator outside-domain behavior)."""
    loc = transport.TopKLocator(mesh1, k=10)
    pts = jnp.asarray([[0.5, 0.5]])
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((mesh1.n_nodes, 2)))
    new = transport.tracer_step(mesh1, loc, pts, u, dt=0.05)
    np.testing.assert_allclose(np.asarray(new), np.asarray(pts), atol=1e-12)


def test_capture_update():
    pts = jnp.asarray([[0.5, 0.6], [0.9, 0.9], [0.3, 0.5]])
    status = jnp.zeros(3, dtype=jnp.int32)
    status = transport.capture_update(pts, status, (0.5, 0.5), 0.28)
    np.testing.assert_array_equal(np.asarray(status), [1, 0, 1])
    # eaten stays eaten even after moving away
    far = jnp.asarray([[0.0, 0.0], [0.9, 0.9], [0.0, 1.0]])
    status = transport.capture_update(far, status, (0.5, 0.5), 0.28)
    np.testing.assert_array_equal(np.asarray(status), [1, 0, 1])


def test_init_tracer_grid_excludes_cylinder():
    pts = transport.init_tracer_grid(25)
    assert pts.shape[1] == 2
    d = np.hypot(pts[:, 0] - 0.5, pts[:, 1] - 0.5)
    assert (d > 0.25).all()
    assert 450 <= pts.shape[0] <= 625  # 625 minus ~137 cylinder-interior seeds


def test_mixing_index_limits(mesh1):
    from tpufem.ops import assembly

    mass = assembly.lumped_mass(mesh1)
    # fully segregated 0/1 field with mu=0.5 → I ≈ 1
    c = jnp.where(jnp.asarray(mesh1.coords[:, 0]) < 0.5, 1.0, 0.0)
    I, mu, var = transport.mixing_index(c, mass)
    assert 0.9 < float(I) <= 1.0 + 1e-9
    # perfectly mixed field → I = 0
    I2, _, _ = transport.mixing_index(jnp.full(mesh1.n_nodes, 0.5), mass)
    assert float(I2) < 1e-12

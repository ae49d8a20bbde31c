"""Mesh I/O, geometry, and generator tests."""

import numpy as np
import pytest

from tpufem.mesh import generate_annulus_mesh, generate_rect_mesh, load_mesh, io as mesh_io
from tpufem import config as tpufem_config


def test_read_reference_meshes(mesh1, mesh21, mesh_fine):
    # counts from SURVEY.md §2.2 / resource headers
    assert mesh1.n_nodes == 331 and mesh1.n_tris == 522
    assert mesh21.n_nodes == 277 and mesh21.n_tris == 450
    assert mesh_fine.n_nodes == 1067 and mesh_fine.n_tris == 1734
    for m in (mesh1, mesh21, mesh_fine):
        assert m.valid.all()
        assert (m.area > 0).all()
        assert m.markers.max() == 2  # inner circle marker present


def test_read_p2_mesh():
    stem = tpufem_config.reference_mesh_path("mesh2.2")
    if stem is None:
        pytest.skip("mesh2.2 not available")
    m = load_mesh(stem)
    assert m.tris_p2 is not None and m.tris_p2.shape[1] == 6
    assert m.tris.shape[1] == 3
    assert m.n_nodes == 1004 and m.n_tris == 450


def test_read_poly(mesh21):
    assert mesh21.segments is not None
    assert mesh21.holes is not None and mesh21.holes.shape == (1, 2)
    np.testing.assert_allclose(mesh21.holes[0], [0.5, 0.5])


def test_geometry_partition_of_unity(mesh1):
    # sum of basis gradients over a triangle is zero; areas sum to the domain
    np.testing.assert_allclose(mesh1.grads.sum(axis=1), 0.0, atol=1e-12)
    hole_area = np.pi * 0.25**2
    assert abs(mesh1.area.sum() - (1.0 - hole_area)) < 2e-2


def test_generated_rect_mesh():
    m = generate_rect_mesh(10, 10)
    assert m.valid.all()
    np.testing.assert_allclose(m.area.sum(), 1.0, atol=1e-12)


def test_generated_annulus_mesh():
    m = generate_annulus_mesh(n_side=20, n_circle=24)
    assert m.valid.all()
    assert (m.markers == 2).sum() == 24
    # left/right boundary nodes pair exactly for periodicity
    left_y = np.sort(m.coords[np.isclose(m.coords[:, 0], 0.0), 1])
    right_y = np.sort(m.coords[np.isclose(m.coords[:, 0], 1.0), 1])
    np.testing.assert_allclose(left_y, right_y, atol=1e-12)


def test_node_roundtrip(tmp_path, gen_mesh):
    mesh_io.write_node(str(tmp_path / "m.node"), gen_mesh.coords, gen_mesh.markers)
    mesh_io.write_ele(str(tmp_path / "m.ele"), gen_mesh.tris)
    m2 = load_mesh(str(tmp_path / "m"))
    np.testing.assert_allclose(m2.coords, gen_mesh.coords)
    np.testing.assert_array_equal(m2.tris, gen_mesh.tris)
    np.testing.assert_array_equal(m2.markers, gen_mesh.markers)

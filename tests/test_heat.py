"""Heat workload parity vs the NumPy oracle."""

import numpy as np

from baselines import numpy_ref
from tpufem.workloads import heat


def test_heat_parity_50_steps(mesh21):
    u, maxu = heat.run(mesh21, heat.HeatConfig(steps=50))
    u_ref = numpy_ref.heat_run(mesh21.coords, mesh21.tris, mesh21.markers, steps=50)
    l2 = np.linalg.norm(np.asarray(u) - u_ref) / np.linalg.norm(u_ref)
    assert l2 < 1e-8
    assert maxu.shape == (50,)


def test_heat_f32_tracks_f64(mesh21):
    u64, _ = heat.run(mesh21, heat.HeatConfig(steps=50))
    u32, _ = heat.run(mesh21, heat.HeatConfig(steps=50, precision="f32"))
    assert u32.dtype == np.float32 or str(u32.dtype) == "float32"
    err = np.linalg.norm(np.asarray(u32) - np.asarray(u64)) / np.linalg.norm(
        np.asarray(u64)
    )
    assert err < 1e-4, err


def test_heat_steady_state_is_bounded(mesh21):
    """With zero source the implicit solve relaxes toward BC-driven values;
    max|u| must stay bounded by the boundary data (max value 1.0)."""
    u, maxu = heat.run(mesh21, heat.HeatConfig(steps=200))
    assert float(np.asarray(maxu).max()) <= 1.0 + 1e-9
    assert np.isfinite(np.asarray(u)).all()


def test_heat_cg_matches_dense_trajectory():
    """solver='cg' (matrix-free warm-started BiCGStab on the exact
    row-surgery A = I + dt·K_mod, reference quirks included) follows the
    dense-LU trajectory to solver tolerance."""
    import tpufem

    m = tpufem.generate_annulus_mesh(n_side=32, n_circle=32)
    ud, _ = heat.run(m, heat.HeatConfig(steps=50, solver="lu"))
    uc, mc = heat.run(m, heat.HeatConfig(steps=50, solver="cg"))
    np.testing.assert_allclose(np.asarray(ud), np.asarray(uc), atol=1e-8)
    assert abs(float(np.asarray(mc)[-1]) - 1.0) < 1e-6

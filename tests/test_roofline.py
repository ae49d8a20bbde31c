"""Roofline accounting machinery (tpufem/roofline.py) through the
interpret-mode kernels: the traffic model and timing plumbing must
produce finite, self-consistent rows on CPU (the GB/s numbers are only
meaningful on hardware)."""

import numpy as np


def test_roofline_measure_toy_interpret():
    from tpufem import roofline

    r = roofline.measure(28, 32, iters_p=8, iters_v=4, reps=1,
                         label="toy", storage="grid_interpret")
    assert r["form"] == "vmem"
    assert r["n_off_p"] >= 9 and r["n_off_v"] >= 9
    assert r["t_pressure_s"] > 0 and r["t_viscous_s"] > 0
    for k in ("hbm_gbps_pressure", "hbm_gbps_viscous",
              "gflops_pressure", "gflops_viscous"):
        assert np.isfinite(r[k]) and r[k] >= 0
    # per-iteration time ≈ solve time / count (t_pressure_s is rounded
    # to 1e-4 s in the row, so allow half that granularity per iter)
    assert abs(r["us_per_p_iter"] - r["t_pressure_s"] / 8 * 1e6) < 0.5e-4 / 8 * 1e6

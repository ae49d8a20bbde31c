"""Roofline / bandwidth accounting for the whole-solve grid kernels.

VERDICT r3 next #7: steps/s is the product metric, but nothing showed how
close the kernels are to the chip.  This module times the pressure and
viscous whole-solve kernels at FIXED iteration counts (tol=0, so every
iteration runs) and converts the measured per-iteration time into HBM
traffic against the v5e's 819 GB/s peak.

Traffic model (per CG iteration, from the kernel structure in
solve/pallas_cg.py):

* **streamed forms** (``stream_diags``, auto ≥360k nodes): every
  ``apply_K`` re-streams the stacked diag planes from HBM through the
  double-buffered VMEM scratch — ``bytes/apply = pad_even(n_off) · ns² ·
  itemsize``.  The two-level pressure preconditioner costs 2 applies +
  1 in the CG advance = **3 applies/iteration**; Jacobi-preconditioned
  viscous CG costs **1 apply/column-iteration** (the kernel runs its 2
  velocity columns as sequential CG solves).  CG vectors stay
  VMEM-resident; the one-hot remainder and coarse correction move only
  O(Mp·ns + nc²) bytes — counted but negligible.
* **all-VMEM forms** (<360k nodes): every operand is copied HBM→VMEM
  once per *solve* (kernel launch), so per-iteration HBM traffic is the
  operand footprint amortized over the iteration count; the loop itself
  is VPU/VMEM-bound.  We report the same effective-GB/s number (it is
  then a lower bound on the VMEM bandwidth actually sustained) plus the
  achieved f32 FLOP rate (2·n_off·ns² FMA = 4·n_off·ns² flops/apply).

Numbers move with tunnel health — A/B in one process only (TODO.md).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

V5E_HBM_GBPS = 819.0  # public v5e spec: 16 GB HBM2 @ 819 GB/s


def _pad_even(n: int) -> int:
    """Planes the streamed pipeline actually moves per apply: n_off
    rounded up to even PLUS the 2 zero pad planes the run-ahead DMA
    drains (solve/pallas_cg._pad_even) — they cross HBM like any other
    plane, so the traffic model must count them."""
    return n + (n % 2) + 2


def _sync(x):
    """Force execution+materialization of a device value.

    On the tunneled axon runtime ``block_until_ready()`` can return
    without blocking (measured: ~50 µs "blocks" while the solve still
    runs; the next host transfer then waits 300+ s) — the only reliable
    sync is materializing data.  Transfer one row, not the whole plane,
    so the sync itself stays cheap."""
    np.asarray(x[:1])


def _time_best(fn, reps: int = 5):
    """Best-of-reps wall time of fn (fn must _sync its result)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def measure(n_side: int, n_circle: int, iters_p: int = 120,
            iters_v: int = 30, reps: int = 5, label: str | None = None,
            hbm_io: str = "auto", storage: str = "auto",
            precond_bf16: str = "off", batch_cols: str = "on",
            chain: int = 1):
    """One roofline row: build the bench problem at this size, time the
    two whole-solve kernels at fixed iteration counts, convert to GB/s.

    ``chain > 1`` runs K solves per dispatch (see :func:`_chain`) so the
    tunnel's per-dispatch latency — up to ~35 ms in slow windows, the
    size of a whole 410k viscous solve — is amortized out of the
    per-iteration numbers."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from tpufem import bench_large
    import tpufem

    bench_large.enable_compile_cache()
    t0 = time.perf_counter()
    mesh = tpufem.generate_annulus_mesh(
        n_side=n_side, n_circle=n_circle, pad_hole=True
    )
    from tpufem.workloads import stokes

    config = bench_large.bench_config(
        "twolevel", n_nodes=int(mesh.n_nodes), transport="none",
        storage=storage, hbm_io=hbm_io,
    )
    config = dataclasses.replace(config, cg_precond_bf16=precond_bf16,
                                 cg_batch_cols=batch_cols)
    problem = stokes.StokesProblem.build(mesh, config)
    build_s = time.perf_counter() - t0

    ps = dataclasses.replace(problem.pressure_solver, tol=0.0, iters=iters_p)
    vs = dataclasses.replace(problem.visc_solver, tol=0.0, iters=iters_v)
    ns = ps.K.ns
    itemsize = np.dtype(np.asarray(ps.K.diags).dtype).itemsize
    n_off_p, n_off_v = len(ps.K.offsets), len(vs.K.offsets)
    plane = ns * ns * itemsize

    rng = np.random.default_rng(0)
    dtype = np.float32 if itemsize == 4 else np.float64
    bp = jnp.asarray(rng.standard_normal(ns * ns).astype(dtype))
    bv = jnp.asarray(rng.standard_normal((ns * ns, 2)).astype(dtype))

    import jax as _jax

    solve_p = _chain(lambda b: ps.solve(b), chain)
    solve_v = _chain(lambda b: vs.solve(b), chain)
    t0 = time.perf_counter()
    _sync(solve_p(bp))
    _sync(solve_v(bv))
    compile_s = time.perf_counter() - t0

    t_p = _time_best(lambda: _sync(solve_p(bp)), reps) / chain
    t_v = _time_best(lambda: _sync(solve_v(bv)), reps) / chain

    streamed = bool(getattr(ps, "stream_diags", False))
    # per-apply HBM bytes (streamed) or per-solve operand footprint (VMEM)
    bytes_apply_p = _pad_even(n_off_p) * plane
    bytes_apply_v = _pad_even(n_off_v) * plane
    applies_p = 3 if ps.use_coarse else 1  # 2 in precond + 1 in advance
    pb = bool(getattr(ps, "precond_bf16", False))
    # bf16 precond: the 2 preconditioner applies stream half-width planes
    eff_applies_p = (2.0 if pb else 3.0) if ps.use_coarse else 1.0
    vbatch = bool(getattr(vs, "batch_cols", False))
    if streamed:
        hbm_bytes_p = eff_applies_p * iters_p * bytes_apply_p
        # batched columns: ONE plane stream per iteration serves both;
        # sequential: each column's CG re-streams the planes
        hbm_bytes_v = (1 if vbatch else 2) * iters_v * bytes_apply_v
    else:
        # operands cross HBM once per launch (+ b in, x out)
        hbm_bytes_p = (n_off_p + 8) * plane  # planes + masks/ml/invd/b/out
        hbm_bytes_v = (n_off_v + 8) * plane  # planes + mask/invd/b/x0/out
    gbps_p = hbm_bytes_p / t_p / 1e9
    gbps_v = hbm_bytes_v / t_v / 1e9
    # achieved f32 FLOPs in the offset FMAs alone (4 flops per FMA pair
    # per point per offset: mul+add over real planes, pads are zero work)
    flops_p = applies_p * iters_p * 2 * n_off_p * ns * ns / t_p
    flops_v = 2 * iters_v * 2 * n_off_v * ns * ns / t_v

    row = {
        "label": label or f"{ns}x{ns}",
        "n_nodes": int(mesh.n_nodes),
        "ns": int(ns),
        "form": ("xl" if getattr(ps, "hbm_io", False)
                 else "stream" if streamed else "vmem"),
        "precond_bf16": bool(getattr(ps, "precond_bf16", False)),
        "batch_cols": vbatch,
        "chain": chain,
        "itemsize": itemsize,
        "n_off_p": n_off_p,
        "n_off_v": n_off_v,
        "iters_p": iters_p,
        "iters_v": iters_v,
        "t_pressure_s": round(t_p, 4),
        "t_viscous_s": round(t_v, 4),
        "us_per_p_iter": round(t_p / iters_p * 1e6, 1),
        "us_per_v_coliter": round(t_v / (2 * iters_v) * 1e6, 1),
        "hbm_gbps_pressure": round(gbps_p, 1),
        "hbm_gbps_viscous": round(gbps_v, 1),
        "pct_peak_pressure": round(100 * gbps_p / V5E_HBM_GBPS, 1),
        "pct_peak_viscous": round(100 * gbps_v / V5E_HBM_GBPS, 1),
        "gflops_pressure": round(flops_p / 1e9, 1),
        "gflops_viscous": round(flops_v / 1e9, 1),
        "build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
    }
    return row


SIZES = [
    ("160k", 400, 448),
    ("410k", 640, 720),
    ("1.05M", 1024, 1088),
]


def _chain(solve, K: int):
    """jit(solve) chained K× per dispatch (output fed back, normalized so
    repeated application can't overflow).  Amortizes the tunnel's
    per-dispatch latency (25-35 ms in slow windows — the same magnitude
    as one whole viscous solve at 410k) to 1/K per solve; K is kept small
    enough that one dispatch stays far under the tunnel's multi-minute
    kill horizon."""
    import jax
    import jax.numpy as jnp

    if K <= 1:
        return jax.jit(solve)

    def run(b):
        def body(_, bb):
            x = solve(bb)
            return x / (jnp.sqrt(jnp.sum(x * x)) + 1e-30)

        return jax.lax.fori_loop(0, K, body, b)

    return jax.jit(run)


def ab(n_side: int, n_circle: int, knobs, iters_p: int = 120,
       iters_v: int = 30, reps: int = 8, chain: int = 8,
       label: str | None = None, hbm_io: str = "auto",
       storage: str = "auto"):
    """Interleaved A/B of StokesConfig knob combos at one size: all
    configs built + compiled first, then timed round-robin (rep 0 of
    every config, rep 1 of every config, ...) so tunnel drift hits
    every config equally.  ``knobs``: a list of either (precond_bf16,
    batch_cols) pairs (legacy) or dicts of StokesConfig field
    overrides.  Returns one row per combo."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from tpufem import bench_large
    import tpufem
    from tpufem.workloads import stokes

    bench_large.enable_compile_cache()
    mesh = tpufem.generate_annulus_mesh(
        n_side=n_side, n_circle=n_circle, pad_hole=True
    )

    entries = []
    for knob in knobs:
        if not isinstance(knob, dict):
            pb, bc = knob
            knob = {"cg_precond_bf16": pb, "cg_batch_cols": bc}
        t0 = time.perf_counter()
        config = bench_large.bench_config(
            "twolevel", n_nodes=int(mesh.n_nodes), transport="none",
            storage=storage, hbm_io=hbm_io,
        )
        config = dataclasses.replace(config, **knob)
        problem = stokes.StokesProblem.build(mesh, config)
        build_s = time.perf_counter() - t0
        ps = dataclasses.replace(problem.pressure_solver, tol=0.0,
                                 iters=iters_p)
        vs = dataclasses.replace(problem.visc_solver, tol=0.0,
                                 iters=iters_v)
        ns = ps.K.ns
        itemsize = np.dtype(np.asarray(ps.K.diags).dtype).itemsize
        dtype = np.float32 if itemsize == 4 else np.float64
        rng = np.random.default_rng(0)
        bp = jnp.asarray(rng.standard_normal(ns * ns).astype(dtype))
        bv = jnp.asarray(rng.standard_normal((ns * ns, 2)).astype(dtype))
        sp = _chain(lambda b, _ps=ps: _ps.solve(b), chain)
        sv = _chain(lambda b, _vs=vs: _vs.solve(b), chain)
        t0 = time.perf_counter()
        _sync(sp(bp))
        _sync(sv(bv))
        compile_s = time.perf_counter() - t0
        entries.append(dict(
            knob=knob, ps=ps, vs=vs, sp=sp, sv=sv, bp=bp, bv=bv,
            ns=ns, itemsize=itemsize, build_s=build_s,
            compile_s=compile_s, best_p=float("inf"),
            best_v=float("inf"),
        ))
        print(f"# built {knob or 'defaults'} "
              f"(build {build_s:.1f}s compile {compile_s:.1f}s)",
              flush=True)

    for rep in range(reps):
        for e in entries:
            t0 = time.perf_counter()
            _sync(e["sp"](e["bp"]))
            e["best_p"] = min(e["best_p"], time.perf_counter() - t0)
            t0 = time.perf_counter()
            _sync(e["sv"](e["bv"]))
            e["best_v"] = min(e["best_v"], time.perf_counter() - t0)

    rows = []
    for e in entries:
        ps, vs, ns, itemsize = e["ps"], e["vs"], e["ns"], e["itemsize"]
        t_p = e["best_p"] / chain
        t_v = e["best_v"] / chain
        n_off_p, n_off_v = len(ps.K.offsets), len(vs.K.offsets)
        plane = ns * ns * itemsize
        streamed = bool(getattr(ps, "stream_diags", False))
        pb = bool(getattr(ps, "precond_bf16", False))
        vbatch = bool(getattr(vs, "batch_cols", False))
        eff_applies_p = (2.0 if pb else 3.0) if ps.use_coarse else 1.0
        if streamed:
            hbm_bytes_p = eff_applies_p * iters_p * _pad_even(n_off_p) * plane
            hbm_bytes_v = ((1 if vbatch else 2) * iters_v
                           * _pad_even(n_off_v) * plane)
        else:
            hbm_bytes_p = (n_off_p + 8) * plane
            hbm_bytes_v = (n_off_v + 8) * plane
        gbps_p = hbm_bytes_p / t_p / 1e9
        gbps_v = hbm_bytes_v / t_v / 1e9
        rows.append({
            "label": label or f"{ns}x{ns}",
            "n_nodes": int(mesh.n_nodes),
            "ns": int(ns),
            "form": ("xl" if getattr(ps, "hbm_io", False)
                     else "stream" if streamed else "vmem"),
            "knobs": e["knob"],
            "precond_bf16": pb,
            "batch_cols": vbatch,
            "roll_cache": bool(getattr(ps, "roll_cache", False)),
            "chain": chain,
            "reps": reps,
            "iters_p": iters_p,
            "iters_v": iters_v,
            "t_pressure_s": round(t_p, 5),
            "t_viscous_s": round(t_v, 5),
            "us_per_p_iter": round(t_p / iters_p * 1e6, 1),
            "us_per_v_coliter": round(t_v / (2 * iters_v) * 1e6, 1),
            "hbm_gbps_pressure": round(gbps_p, 1),
            "hbm_gbps_viscous": round(gbps_v, 1),
            "pct_peak_pressure": round(100 * gbps_p / V5E_HBM_GBPS, 1),
            "pct_peak_viscous": round(100 * gbps_v / V5E_HBM_GBPS, 1),
            "build_s": round(e["build_s"], 1),
            "compile_s": round(e["compile_s"], 1),
        })
    return rows


def probes(n_side: int, n_circle: int, iters_p: int = 120, reps: int = 8,
           chain: int = 8, label: str | None = None, chunk: int = 1):
    """nodma/nofma decomposition of the streamed pressure kernel
    (VERDICT r4 next #3): one problem, three kernel variants timed
    round-robin in one process —

    * ``real``  — the production kernel,
    * ``nofma`` — DMA pipeline only (no roll/FMA): the stream floor,
    * ``nodma`` — roll+FMA loop only (stale scratch): the compute floor.

    real ≈ nofma ⇒ the kernel is DMA-pipeline-bound (the chunk lever);
    real ≈ nodma ⇒ it is compute/serialization-bound (deeper buffering).
    ``chunk`` sets cg_stream_chunk so the same decomposition can be
    measured on the chunked pipeline."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from tpufem import bench_large
    import tpufem
    from tpufem.workloads import stokes

    bench_large.enable_compile_cache()
    mesh = tpufem.generate_annulus_mesh(
        n_side=n_side, n_circle=n_circle, pad_hole=True
    )
    config = dataclasses.replace(
        bench_large.bench_config(
            "twolevel", n_nodes=int(mesh.n_nodes), transport="none",
        ),
        cg_stream_chunk=chunk,
    )
    problem = stokes.StokesProblem.build(mesh, config)
    base = dataclasses.replace(problem.pressure_solver, tol=0.0,
                               iters=iters_p)
    ns = base.K.ns
    itemsize = np.dtype(np.asarray(base.K.diags).dtype).itemsize
    dtype = np.float32 if itemsize == 4 else np.float64
    rng = np.random.default_rng(0)
    bp = jnp.asarray(rng.standard_normal(ns * ns).astype(dtype))

    entries = []
    for probe in ("", "nofma", "nodma"):
        ps = dataclasses.replace(base, probe=probe)
        sp = _chain(lambda b, _ps=ps: _ps.solve(b), chain)
        t0 = time.perf_counter()
        _sync(sp(bp))
        compile_s = time.perf_counter() - t0
        entries.append(dict(probe=probe or "real", sp=sp,
                            compile_s=compile_s, best=float("inf")))
        print(f"# built probe={probe or 'real'} ({compile_s:.1f}s)",
              flush=True)
    for _ in range(reps):
        for e in entries:
            t0 = time.perf_counter()
            _sync(e["sp"](bp))
            e["best"] = min(e["best"], time.perf_counter() - t0)
    rows = []
    for e in entries:
        t_p = e["best"] / chain
        rows.append({
            "label": label or f"{ns}x{ns}",
            "n_nodes": int(mesh.n_nodes),
            "ns": int(ns),
            "probe": e["probe"],
            "stream_chunk": chunk,
            "chain": chain,
            "reps": reps,
            "iters_p": iters_p,
            "t_pressure_s": round(t_p, 5),
            "us_per_p_iter": round(t_p / iters_p * 1e6, 1),
            "compile_s": round(e["compile_s"], 1),
        })
    return rows


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(prog="tpufem roofline")
    parser.add_argument("--sizes", default=None)
    parser.add_argument("--iters-p", type=int, default=120)
    parser.add_argument("--iters-v", type=int, default=30)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--ab", action="store_true",
                        help="interleaved chained A/B of the "
                             "precond_bf16/batch_cols knobs")
    parser.add_argument("--chain", type=int, default=8)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    wanted = set(args.sizes.split(",")) if args.sizes else None
    rows = []
    for label, n_side, n_circle in SIZES:
        if wanted is not None and label not in wanted:
            continue
        if args.ab:
            for r in ab(n_side, n_circle,
                        knobs=[{"cg_roll_cache": "off"}, {},
                               {"cg_precond_bf16": "on"}],
                        iters_p=args.iters_p, iters_v=args.iters_v,
                        reps=args.reps, chain=args.chain, label=label):
                print(json.dumps(r), flush=True)
                rows.append(r)
            continue
        r = measure(n_side, n_circle, iters_p=args.iters_p,
                    iters_v=args.iters_v, reps=args.reps, label=label,
                    chain=args.chain)
        print(json.dumps(r), flush=True)
        rows.append(r)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return rows


if __name__ == "__main__":
    main()

"""Whole-solve VMEM-resident PCG kernels (Pallas TPU).

Motivation (measured on the tunneled v5e runtime, round 2): XLA executes
one fused kernel per elementwise op at ~2–9 GB/s of MATERIALIZED WRITE
bandwidth plus O(100 µs) dispatch, so a 79k-node pressure solve — ~25 CG
iterations × (SpMV + two-level preconditioner + axpys), each op writing a
315 KB vector to HBM — costs ~56 ms even though the arithmetic is
trivial.  These kernels run the ENTIRE solve in ONE ``pallas_call`` with
every vector resident in VMEM: per-iteration cost collapses to VPU/MXU
work, and HBM is touched exactly twice (operands in, solution out).

Operator form: :class:`tpufem.ops.gridop.GridOperator` — dense 2-D
roll-offsets + exact one-hot MXU remainder — over ring-in-grid pad_hole
meshes (N = ns²).  See gridop.py for why rolls-with-zero-masked-diags
are exact, including the periodic-x wrap.

Solvers (same math as solve/matfree.py + solve/cg.py, kernel-inlined):

* :class:`ViscousGridCG` — ``(I + dtν·K)`` masked to interior dofs,
  Jacobi-PCG, one CG per velocity component (matfree.ViscousCG parity).
* :class:`PressureGridCG` — merged periodic pressure operator,
  constant-nullspace deflation on the active dofs, separable block
  two-level preconditioner (restriction/prolongation = two small MXU
  matmuls: aggregates are by×bx grid blocks), damped-Jacobi smoothing
  (matfree.PressureCG + solve/twolevel.py parity).

Replaces the reference's per-step dense solves
(``/root/reference/code/StokesColor.py:544-569``) in the ≥50k-node
regime the reference cannot reach.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.ops.gridop import GridOperator


def _roll2(X, dy: int, s: int, ns: int, interpret: bool):
    """out[iy, ix] = X[(iy+dy) mod ns, (ix+s) mod ns] (both axes cyclic)."""
    if interpret:
        return jnp.roll(jnp.roll(X, -dy, -2), -s, -1)
    from jax.experimental.pallas import tpu as pltpu

    out = X
    if dy % ns:
        # int32: the shift operand otherwise traces as i64 under x64 mode,
        # which tpu.dynamic_rotate rejects
        out = pltpu.roll(out, jnp.int32((-dy) % ns), out.ndim - 2)
    if s % ns:
        out = pltpu.roll(out, jnp.int32((-s) % ns), out.ndim - 1)
    return out


_VMEM_LIMIT = int(127.5 * 2**20)  # scoped-VMEM budget for the
# whole-solve kernels.  v5e exposes 128 MiB; Mosaic's default 16 MiB
# rejects the CG loop's temporaries outright.  116 MiB was the round-3
# working value (117.32 MB measured at ns=1024); at ns=1408 (2M nodes,
# 22 offsets) the pressure kernel measures 121.13 MiB and the viscous
# solve 127.15 MiB — the cap now sits at 127.5 MiB (anything over
# hardware capacity still fails at compile, so the cap only exists to
# leave a margin for the runtime's own use)

_LOOP_OFFSETS_FROM = 12  # ≥: apply offsets in a fori_loop with DYNAMIC
# roll shifts instead of unrolling — renumbered arbitrary meshes carry
# 13–24 offsets and the unrolled form made Mosaic compiles take 10–30
# minutes (measured 780–1640 s cold on mesh_fine/105k gridified);
# the loop form trades a little ILP for an O(1)-size program


def _pad_even(n: int, chunk: int = 1) -> int:
    """Streamed-loop plane count: n_off rounded up to a multiple of
    2·chunk (the loop body consumes chunk-sized plane groups in pairs
    with static scratch slots) plus 2·chunk zero pad planes (so the
    software pipeline's run-ahead DMA start of group g+2 is always in
    bounds).  chunk=1 is the classic one-plane-per-DMA pipeline;
    chunk=2 halves the DMA issue count (round-5 pressure-floor lever:
    the measured stream time is ~2× the pure-bandwidth ideal, i.e.
    issue/latency-bound, not byte-bound)."""
    c2 = 2 * chunk
    return -(-n // c2) * c2 + c2


def _make_apply(offsets, ns: int, interpret: bool, stream: bool = False,
                stream_loop: bool = False, roll_cache: bool = False,
                chunk: int = 1, probe: str = ""):
    """K·x on the (ns, ns) grid from kernel REFS (diags + remainder).

    ``roll_cache=True`` (dynamic-roll forms only — ``stream_loop`` and
    the non-streamed ``loop`` form): build per apply a small VMEM cache
    of the SUBLANE-rolled source plane, one entry per distinct row
    shift (5–7 for these stencils, ``_row_groups``), with STATIC shift
    amounts; each plane's FMA then needs only one dynamic LANE roll of
    its cached group plane.  Probes (410k pressure, fixed iters, one
    process) showed the two chained dynamic rotates are ~all of the
    kernels' compute time (~200 µs/iter standalone) while lane-only
    rotates hide completely under the DMA stream (196 µs ≈ the 192 µs
    stream-only floor) — the cache removes the per-plane sublane
    rotate at the cost of n_groups static rotates per apply.  Callers
    allocate the cache scratch (``apply.n_groups`` planes, × C columns
    for the column-batched twin) and pass a 3-row shift table
    (``_shift_table(..., groups=True)``).

    Operands are read PER USE (``d[g]``, ``gr_rowT[:]`` at the dot) —
    reading every ref eagerly at kernel entry pins all operators live
    across the whole CG loop and the Mosaic register allocator spills
    them (measured 124 MB of spill slots in the fused step kernel).

    ``stream=True``: the diag planes ``d`` live in HBM (``pltpu.HBM`` —
    ``pl.ANY`` lets Mosaic re-home them to VMEM, whose tiled layout then
    rejects unaligned plane slices) and
    are double-buffered into a ``(2, ns, ns)`` VMEM scratch plane by
    plane — only 2 planes are VMEM-resident at once instead of n_off,
    which is what carries the whole-solve kernels past the ~325k-node
    all-VMEM ceiling (BASELINE.md round-3 table).  The CG vectors stay
    VMEM-resident; per matvec the streamed bytes are n_off·N·4, which
    at HBM bandwidth is far below one XLA dispatch of the unfused path.

    ``stream_loop=True`` (requires ``stream`` and ``ns % 128 == 0``): the
    planes live in ONE stacked ``(_pad_even(n_off), ns, ns)`` HBM ref and
    the double-buffer pipeline runs as a ``fori_loop`` over plane PAIRS
    (static scratch slots, dynamic plane index, dynamic roll shifts) —
    an O(1)-size program instead of the n_off-unrolled DMA chain, which
    is what made the ≥800k-node Mosaic compiles take 5–13 minutes.  The
    128-divisibility keeps every ``d.at[g]`` memref slice tile-aligned
    (the reason the unrolled form uses separate whole refs)."""
    # the dynamic-shift loop form lowers to tpu.dynamic_rotate, which
    # Mosaic only implements for tile-aligned shapes ("unsupported
    # unaligned shape" at ns=95, measured round 4) — unaligned grids fall
    # back to the unrolled static rolls, which handle any ns
    aligned = interpret or ns % 128 == 0
    loop = stream or (len(offsets) >= _LOOP_OFFSETS_FROM and aligned)
    # roll cache applies only where rolls are DYNAMIC (the static
    # unrolled forms already lower to static rotates)
    dyn_rolls = (stream and stream_loop) or (loop and not stream)
    rcache = roll_cache and dyn_rolls
    grp_shifts = _row_groups(offsets, ns)[0] if rcache else ()

    def apply(d, gr_rowT, gr_laneT, sc_row, sc_laneT, vals, X, n_rest: int,
              sh=None, scratch=None, sem=None, acc=None, x_ref=None,
              cache=None):
        """``sh``: (2, n_off) int32 SMEM ref of (row, lane) roll shifts —
        required when the loop form is active (Pallas kernels cannot
        capture array constants).  ``scratch``/``sem``: (2, ns, ns) VMEM
        buffer + DMA semaphore pair, required when ``stream``.

        ``acc``: optional VMEM ref — the REF-ACCUMULATED form: partial
        sums are written into ``acc`` instead of carried as SSA values,
        so the DMA-pipeline fori_loop carries NO plane at all (scalar
        dummy).  SSA loop carries are what Mosaic's register allocator
        spills at XL sizes (measured 78 MB of spill slots at ns=1280
        with the value-carried form); the acc form is the XL-mode
        matvec.  Returns the SSA value when ``acc is None`` else None.

        ``x_ref``: optional VMEM ref to read the source vector from PER
        USE instead of holding the SSA value ``X`` live across the whole
        pipeline loop (the other spill source at XL sizes: a full-plane
        value live across a fori_loop gets a dedicated spill slot).
        Must not alias ``acc``."""
        if acc is not None:
            acc[:] = jnp.zeros(acc.shape, acc.dtype)
        rd = (lambda: x_ref[:]) if x_ref is not None else (lambda: X)
        # planes may be stored narrower than the vectors (bf16 diag
        # stacks for preconditioner applies — 2 of the 3 plane streams
        # per two-level pressure iteration tolerate bf16 rounding, so
        # storing a second bf16 stack cuts streamed bytes ~33%); cast
        # at use, accumulation stays in the vector dtype
        xdt = x_ref.dtype if x_ref is not None else X.dtype
        up = lambda v: v if v.dtype == xdt else v.astype(xdt)
        use_cache = rcache and cache is not None

        def fill_cache():
            # static-shift sublane rolls, one per distinct row shift;
            # built per apply (the source plane changes every matvec)
            Xv = rd()
            for k, sft in enumerate(grp_shifts):
                if sft == 0:
                    cache[k] = Xv
                elif interpret:
                    cache[k] = jnp.roll(Xv, sft, -2)
                else:
                    from jax.experimental.pallas import tpu as pltpu

                    cache[k] = pltpu.roll(Xv, jnp.int32(sft), Xv.ndim - 2)

        def roll_cached(g):
            base = cache[sh[2, g]]
            if interpret:
                return jnp.roll(base, sh[1, g], -1)
            from jax.experimental.pallas import tpu as pltpu

            return pltpu.roll(base, sh[1, g], base.ndim - 1)

        if stream and stream_loop:
            # Dynamic-plane double-buffer: ``d`` is ONE stacked
            # (_pad_even(n_off, chunk), ns, ns) HBM ref, the pipeline a
            # fori_loop over CHUNK-GROUP pairs (chunk=1: plane pairs).
            # Scratch slots stay STATIC (slot 0 ↔ even groups, slot 1 ↔
            # odd) so no dynamic VMEM reads; plane index and roll shifts
            # are dynamic (SMEM table ``sh``, padded with zero shifts for
            # the pad planes, whose values are zero).  chunk>1 moves
            # ``chunk`` planes per async copy — same bytes, 1/chunk the
            # DMA issue count (round-5 lever: the measured stream floor
            # is ~2× the pure-bandwidth ideal, i.e. issue-bound).
            # ``probe`` (measurement only, roofline.py): "nodma" skips
            # every DMA (compute on stale scratch — times the roll+FMA
            # loop alone), "nofma" skips every FMA (times the DMA
            # pipeline alone).
            assert scratch is not None and sem is not None and sh is not None
            from jax.experimental.pallas import tpu as pltpu

            CH = chunk
            E = _pad_even(len(offsets), CH) - 2 * CH  # real+pad planes
            fma_on = probe != "nofma"
            dma_on = probe != "nodma"

            if CH == 1:
                def dma(g, slot: int):
                    return pltpu.make_async_copy(
                        d.at[g], scratch[slot], sem.at[jnp.int32(slot)]
                    )
            else:
                def dma(c, slot: int):
                    from jax.experimental import pallas as pl

                    return pltpu.make_async_copy(
                        d.at[pl.ds(c * CH, CH)], scratch[slot],
                        sem.at[jnp.int32(slot)],
                    )

            def roll_g(g):
                if use_cache:
                    return roll_cached(g)
                Xv = rd()
                if interpret:
                    return jnp.roll(jnp.roll(Xv, sh[0, g], -2), sh[1, g], -1)
                return pltpu.roll(
                    pltpu.roll(Xv, sh[0, g], Xv.ndim - 2), sh[1, g],
                    Xv.ndim - 1,
                )

            def add_slot(Y, slot: int, c):
                """Y + Σ_k scratch[slot][k]·roll(X, shift[c·CH+k]), added
                term by term in plane order — the SAME accumulation
                association as the chunk=1 pipeline, so chunking is
                bit-exact."""
                if CH == 1:
                    return Y + up(scratch[slot][:]) * roll_g(c)
                for k in range(CH):
                    Y = Y + up(scratch[slot][k]) * roll_g(c * CH + k)
                return Y

            def acc_slot(slot: int, c):
                if CH == 1:
                    acc[:] = acc[:] + up(scratch[slot][:]) * roll_g(c)
                    return
                for k in range(CH):
                    acc[:] = acc[:] + up(scratch[slot][k]) * roll_g(c * CH + k)

            if dma_on:
                dma(jnp.int32(0), 0).start()
                dma(jnp.int32(1), 1).start()
            if use_cache:
                fill_cache()  # overlaps the two run-ahead DMAs

            n_groups_loop = E // CH  # chunk groups (multiple of 2)

            if acc is None:
                def body(i, Y):
                    c0 = 2 * i
                    if dma_on:
                        dma(c0, 0).wait()
                    if fma_on:
                        Y = add_slot(Y, 0, c0)
                    if dma_on:
                        dma(c0 + 2, 0).start()
                        dma(c0 + 1, 1).wait()
                    if fma_on:
                        Y = add_slot(Y, 1, c0 + 1)
                    if dma_on:
                        dma(c0 + 3, 1).start()
                    return Y

                # i32 bounds: under jax_enable_x64 Python-int bounds make
                # the induction variable i64, but Mosaic lowers it as i32
                # — the body's `2 * i` then emits muli(i64, i32) and
                # verification fails (TPU-only; interpret never sees it)
                Y = jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(n_groups_loop // 2), body,
                    jnp.zeros_like(rd())
                )
            else:
                def body_acc(i, c):
                    c0 = 2 * i
                    if dma_on:
                        dma(c0, 0).wait()
                    if fma_on:
                        acc_slot(0, c0)
                    if dma_on:
                        dma(c0 + 2, 0).start()
                        dma(c0 + 1, 1).wait()
                    if fma_on:
                        acc_slot(1, c0 + 1)
                    if dma_on:
                        dma(c0 + 3, 1).start()
                    return c

                jax.lax.fori_loop(
                    jnp.int32(0), jnp.int32(n_groups_loop // 2), body_acc,
                    jnp.int32(0)
                )
            # drain the two run-ahead DMAs (groups E/CH, E/CH+1 — zero pads)
            if dma_on:
                dma(jnp.int32(n_groups_loop), 0).wait()
                dma(jnp.int32(n_groups_loop + 1), 1).wait()
        elif stream:
            # Static-unrolled double-buffered plane streaming: DMA plane
            # g+1 HBM→VMEM while multiplying plane g.  ``d`` is a TUPLE
            # of n_off separate (ns, ns) HBM refs and ``scratch`` a pair
            # of (ns, ns) VMEM refs — whole-ref copies only: memref_slice
            # on a stacked (n_off, ns, ns) operand demands 128-aligned
            # lane slices (and i32 indices), which unpadded ns violates.
            assert scratch is not None and sem is not None
            from jax.experimental.pallas import tpu as pltpu

            n_off = len(offsets)

            def get_dma(slot: int, g: int):
                return pltpu.make_async_copy(
                    d[g], scratch[slot], sem.at[jnp.int32(slot)]
                )

            get_dma(0, 0).start()
            Y = None if acc is not None else jnp.zeros_like(rd())
            for g, (dy, s) in enumerate(offsets):
                slot = g % 2
                if g + 1 < n_off:
                    get_dma((g + 1) % 2, g + 1).start()
                get_dma(slot, g).wait()
                term = up(scratch[slot][:]) * _roll2(rd(), dy, s, ns, interpret)
                if acc is not None:
                    acc[:] = acc[:] + term
                else:
                    Y = Y + term
        elif loop:
            assert sh is not None, "loop-form apply needs the shift ref"

            def rolled(g):
                if use_cache:
                    return roll_cached(g)
                Xv = rd()
                if interpret:
                    return jnp.roll(jnp.roll(Xv, sh[0, g], -2), sh[1, g], -1)
                from jax.experimental.pallas import tpu as pltpu

                return pltpu.roll(
                    pltpu.roll(Xv, sh[0, g], Xv.ndim - 2), sh[1, g],
                    Xv.ndim - 1,
                )

            if use_cache:
                fill_cache()
            if acc is None:
                Y = jax.lax.fori_loop(
                    0, len(offsets), lambda g, Y: Y + up(d[g]) * rolled(g),
                    jnp.zeros_like(rd()),
                )
            else:
                def body_acc(g, c):
                    acc[:] = acc[:] + up(d[g]) * rolled(g)
                    return c

                jax.lax.fori_loop(0, len(offsets), body_acc, jnp.int32(0))
        else:
            Y = None if acc is not None else jnp.zeros_like(rd())
            for g, (dy, s) in enumerate(offsets):
                term = up(d[g]) * _roll2(rd(), dy, s, ns, interpret)
                if acc is not None:
                    acc[:] = acc[:] + term
                else:
                    Y = Y + term
        if n_rest:
            T = jnp.dot(gr_rowT[:], rd(), preferred_element_type=jnp.float32)
            xs = jnp.sum(T * gr_laneT[:], axis=1, keepdims=True)  # (Mp, 1)
            w = vals[:] * xs
            rest = jnp.dot(sc_row[:], w * sc_laneT[:],
                           preferred_element_type=jnp.float32)
            if acc is not None:
                acc[:] = acc[:] + rest
            else:
                Y = Y + rest
        if acc is not None:
            return None
        return Y

    apply.n_groups = len(grp_shifts)
    return apply


def _make_apply_cols(offsets, ns: int, interpret: bool, stream: bool = False,
                     stream_loop: bool = False, roll_cache: bool = False):
    """Column-tuple twin of :func:`_make_apply`: ``Xs`` is a TUPLE of C
    (ns, ns) planes and one plane load (one DMA stream pass when
    ``stream``) feeds all C FMAs — the round-4 roofline lever for the
    viscous/NS kernels, whose per-column sequential solves re-streamed
    the planes C times.

    Everything stays 2-D and scalar: the first attempt carried
    (C, ns, ns) state with (C, 1, 1) keepdims reductions, and Mosaic's
    vector-layout inference rejects the degenerate rank-3 reshapes those
    lower to (measured: ``inferReshape`` CHECK-fail SIGABRT on v5e).
    Tuples of planes + per-column python-unrolled scalars use exactly
    the op set the single-column kernels already exercise."""
    aligned = interpret or ns % 128 == 0
    loop = stream or (len(offsets) >= _LOOP_OFFSETS_FROM and aligned)
    dyn_rolls = (stream and stream_loop) or (loop and not stream)
    rcache = roll_cache and dyn_rolls
    grp_shifts = _row_groups(offsets, ns)[0] if rcache else ()
    n_grp = len(grp_shifts)

    def apply(d, gr_rowT, gr_laneT, sc_row, sc_laneT, vals, Xs, n_rest: int,
              sh=None, scratch=None, sem=None, cache=None):
        C = len(Xs)
        zeros = tuple(jnp.zeros_like(x) for x in Xs)
        use_cache = rcache and cache is not None

        def fill_cache():
            # per column: one static-shift sublane roll per distinct
            # row shift (see _make_apply's roll-cache docstring)
            for c, Xv in enumerate(Xs):
                for k, sft in enumerate(grp_shifts):
                    if sft == 0:
                        cache[c * n_grp + k] = Xv
                    elif interpret:
                        cache[c * n_grp + k] = jnp.roll(Xv, sft, -2)
                    else:
                        from jax.experimental.pallas import tpu as pltpu

                        cache[c * n_grp + k] = pltpu.roll(
                            Xv, jnp.int32(sft), Xv.ndim - 2
                        )

        def roll_dyn(x, g, c=0):
            if use_cache:
                base = cache[c * n_grp + sh[2, g]]
                if interpret:
                    return jnp.roll(base, sh[1, g], -1)
                from jax.experimental.pallas import tpu as pltpu

                return pltpu.roll(base, sh[1, g], base.ndim - 1)
            if interpret:
                return jnp.roll(jnp.roll(x, sh[0, g], -2), sh[1, g], -1)
            from jax.experimental.pallas import tpu as pltpu

            return pltpu.roll(
                pltpu.roll(x, sh[0, g], x.ndim - 2), sh[1, g], x.ndim - 1
            )

        if stream and stream_loop:
            from jax.experimental.pallas import tpu as pltpu

            E = _pad_even(len(offsets)) - 2

            def dma(g, slot: int):
                return pltpu.make_async_copy(
                    d.at[g], scratch[slot], sem.at[jnp.int32(slot)]
                )

            dma(jnp.int32(0), 0).start()
            dma(jnp.int32(1), 1).start()
            if use_cache:
                fill_cache()  # overlaps the two run-ahead DMAs

            def body(i, Ys):
                g0 = 2 * i
                dma(g0, 0).wait()
                p0 = scratch[0][:]
                Ys = tuple(y + p0 * roll_dyn(x, g0, c)
                           for c, (y, x) in enumerate(zip(Ys, Xs)))
                dma(g0 + 2, 0).start()
                dma(g0 + 1, 1).wait()
                p1 = scratch[1][:]
                Ys = tuple(y + p1 * roll_dyn(x, g0 + 1, c)
                           for c, (y, x) in enumerate(zip(Ys, Xs)))
                dma(g0 + 3, 1).start()
                return Ys

            Ys = jax.lax.fori_loop(
                jnp.int32(0), jnp.int32(E // 2), body, zeros
            )
            dma(jnp.int32(E), 0).wait()
            dma(jnp.int32(E + 1), 1).wait()
        elif stream:
            from jax.experimental.pallas import tpu as pltpu

            n_off = len(offsets)

            def get_dma(slot: int, g: int):
                return pltpu.make_async_copy(
                    d[g], scratch[slot], sem.at[jnp.int32(slot)]
                )

            get_dma(0, 0).start()
            Ys = zeros
            for g, (dy, s) in enumerate(offsets):
                slot = g % 2
                if g + 1 < n_off:
                    get_dma((g + 1) % 2, g + 1).start()
                get_dma(slot, g).wait()
                plane = scratch[slot][:]
                Ys = tuple(
                    y + plane * _roll2(x, dy, s, ns, interpret)
                    for y, x in zip(Ys, Xs)
                )
        elif loop:
            assert sh is not None
            if use_cache:
                fill_cache()

            def body(g, Ys):
                plane = d[g]
                return tuple(y + plane * roll_dyn(x, g, c)
                             for c, (y, x) in enumerate(zip(Ys, Xs)))

            Ys = jax.lax.fori_loop(0, len(offsets), body, zeros)
        else:
            Ys = zeros
            for g, (dy, s) in enumerate(offsets):
                plane = d[g]
                Ys = tuple(
                    y + plane * _roll2(x, dy, s, ns, interpret)
                    for y, x in zip(Ys, Xs)
                )
        if n_rest:
            out = []
            for y, x in zip(Ys, Xs):
                T = jnp.dot(gr_rowT[:], x,
                            preferred_element_type=jnp.float32)
                xs = jnp.sum(T * gr_laneT[:], axis=1, keepdims=True)
                w = vals[:] * xs
                out.append(y + jnp.dot(sc_row[:], w * sc_laneT[:],
                                       preferred_element_type=jnp.float32))
            Ys = tuple(out)
        return Ys

    apply.n_groups = n_grp
    return apply


def _row_groups(offsets, ns: int):
    """Unique sublane (row) roll shifts and the per-plane group index.

    The grid stencils touch only {0, ±1, ±2} mod ns in each axis, so
    the n_off planes share 5–7 distinct row shifts — the basis of the
    roll-cache apply (see ``_make_apply``)."""
    rows = [(-dy) % ns for dy, _ in offsets]
    uniq = sorted(set(rows))
    idx = {v: k for k, v in enumerate(uniq)}
    return tuple(uniq), [idx[r] for r in rows]


def _shift_rows(offsets, ns: int, pad_to: int = 0,
                groups: bool = False) -> np.ndarray:
    """Host int32 table for the loop-form apply: rows 0/1 are (row,
    lane) roll shifts, optional row 2 the roll-cache group index
    (zero-padded columns for the stream_loop pad planes)."""
    rows = [[(-dy) % ns for dy, _ in offsets],
            [(-s) % ns for _, s in offsets]]
    if groups:
        rows.append(list(_row_groups(offsets, ns)[1]))
    for r in rows:
        r.extend([0] * max(0, pad_to - len(r)))
    return np.asarray(rows, dtype=np.int32)


def _shift_table(offsets, ns: int, pad_to: int = 0,
                 groups: bool = False) -> jnp.ndarray:
    """Device twin of :func:`_shift_rows`."""
    return jnp.asarray(_shift_rows(offsets, ns, pad_to, groups))


def _stacked_padded_diags(diags: jnp.ndarray, chunk: int = 1) -> jnp.ndarray:
    """(_pad_even(n_off, chunk), ns, ns) stack for the stream_loop DMA
    pipeline."""
    n_off = diags.shape[0]
    pad = _pad_even(n_off, chunk) - n_off
    return jnp.concatenate(
        [diags, jnp.zeros((pad,) + diags.shape[1:], diags.dtype)]
    )


def _cg_core(matvec, precond, project, b, x0, iters: int, tol: float):
    """Single-field PCG, the exact cg_fixed/cg algorithm of solve/cg.py
    (denominator guards, preconditioned-direction deflation), traced
    inside the kernel.  ``tol > 0`` uses a genuine early-exit
    ``while_loop`` — with warm starts the steady-state solves finish in
    a handful of iterations instead of the full cap, and unlike the XLA
    path the exit costs nothing here (no recompWhile/pipelining)."""
    b = project(b)
    r0 = project(b - matvec(x0))
    z0 = project(precond(r0))
    rz0 = jnp.sum(r0 * z0)
    atol2 = (tol * jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-30)) ** 2

    def advance(x, r, p, rz):
        Ap = project(matvec(p))
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = project(precond(r))
        rz_new = jnp.sum(r * z)
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        p_new = z + beta * p
        return x, r, p_new, rz_new

    if tol > 0:
        def cond(st):
            _, r, _, _, k = st
            return jnp.logical_and(k < iters, jnp.sum(r * r) > atol2)

        def wbody(st):
            x, r, p, rz, k = st
            x, r, p, rz = advance(x, r, p, rz)
            return (x, r, p, rz, k + 1)

        x, r, _, _, _ = jax.lax.while_loop(
            cond, wbody, (x0, r0, z0, rz0, jnp.int32(0))
        )
        return project(x)

    def body(_, state):
        return advance(*state)

    x, r, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, rz0))
    return project(x)


def _cg_core_cols(matvec, precond, b, x0, iters: int, tol: float):
    """_cg_core over C independent columns in LOCKSTEP — state is a
    TUPLE of C (ns, ns) planes, CG scalars are per-column python-level
    scalars (unrolled over C).  One ``matvec`` call (a
    :func:`_make_apply_cols` apply) serves ALL columns, so in the
    streamed regime the diag planes cross HBM once per iteration
    instead of once per column, and in the all-VMEM regime the
    per-iteration reduction/dependency latencies overlap across
    columns.  All shapes stay 2-D / scalar: Mosaic rejects the
    degenerate rank-3 reshapes that (C, 1, 1)-shaped scalars lower to.

    Per column the arithmetic is the sequential algorithm's; under
    ``tol > 0`` the loop runs until EVERY column meets its own
    tolerance (a converged column keeps iterating — harmless, CG is
    stationary at convergence up to roundoff)."""
    C = len(b)
    r0 = tuple(bc - ac for bc, ac in zip(b, matvec(x0)))
    z0 = tuple(precond(rc) for rc in r0)
    rz0 = tuple(jnp.sum(rc * zc) for rc, zc in zip(r0, z0))
    atol2 = tuple(
        (tol * jnp.maximum(jnp.sqrt(jnp.sum(bc * bc)), 1e-30)) ** 2
        for bc in b
    )

    def advance(x, r, p, rz):
        Ap = matvec(p)
        denom = tuple(jnp.sum(pc * apc) for pc, apc in zip(p, Ap))
        alpha = tuple(
            jnp.where(dc != 0, rzc / dc, 0.0)
            for dc, rzc in zip(denom, rz)
        )
        x = tuple(xc + ac * pc for xc, ac, pc in zip(x, alpha, p))
        r = tuple(rc - ac * apc for rc, ac, apc in zip(r, alpha, Ap))
        z = tuple(precond(rc) for rc in r)
        rz_new = tuple(jnp.sum(rc * zc) for rc, zc in zip(r, z))
        beta = tuple(
            jnp.where(rzc != 0, rznc / rzc, 0.0)
            for rzc, rznc in zip(rz, rz_new)
        )
        p = tuple(zc + bc * pc for zc, bc, pc in zip(z, beta, p))
        return x, r, p, rz_new

    if tol > 0:
        def cond(st):
            _, r, _, _, k = st
            live = [jnp.sum(rc * rc) > at for rc, at in zip(r, atol2)]
            any_live = live[0]
            for l in live[1:]:
                any_live = jnp.logical_or(any_live, l)
            return jnp.logical_and(k < iters, any_live)

        def wbody(st):
            x, r, p, rz, k = st
            x, r, p, rz = advance(x, r, p, rz)
            return (x, r, p, rz, k + 1)

        x, *_ = jax.lax.while_loop(
            cond, wbody, (x0, r0, z0, rz0, jnp.int32(0))
        )
        return x

    def body(_, state):
        return advance(*state)

    x, *_ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, rz0))
    return x


def _cg_core_ref(mv_into, z_into, project_ref, cgx, cgr, cgp, cgt,
                 iters, tol):
    """``_cg_core`` with FULLY ref-resident state — same arithmetic
    order (bit-identical in interpret mode), but x/r/p/Ap/z all live in
    explicit VMEM scratch refs, the matvec accumulates into a ref
    (``apply(..., acc=)``), and the CG loops carry only scalars.

    Why: the SSA form's loop carries pin x/r/p/z plus matvec and
    preconditioner temporaries live across every iteration, and Mosaic's
    register allocator spills them (~90 MB on the fused step kernel,
    VERDICT r2 #4; 78 MB measured on the value-carried viscous XL kernel
    at ns=1280).  Here no plane crosses a loop boundary as a value.

    Contracts: on entry ``cgx`` holds x0 and ``cgp`` holds b; on exit
    ``cgx`` holds the projected solution.  ``mv_into(dst, src)`` writes
    the RAW operator application A·src[:] into ``dst`` reading the
    source PER USE from its ref (no plane value lives across the matvec
    pipeline loop); ``z_into()`` writes
    z = project(precond(r)) into a solver-owned scratch ref (it may use
    ``cgt``) and returns that ref; ``project_ref(ref)`` projects in
    place (identity for the viscous solve)."""
    project_ref(cgp)
    atol2 = (tol * jnp.maximum(jnp.sqrt(jnp.sum(cgp[:] * cgp[:])), 1e-30)) ** 2
    mv_into(cgt, cgx)
    cgr[:] = cgp[:] - cgt[:]
    project_ref(cgr)
    z0 = z_into()
    rz0 = jnp.sum(cgr[:] * z0[:])
    rr0 = jnp.sum(cgr[:] * cgr[:])
    cgp[:] = z0[:]

    def advance(rz):
        mv_into(cgt, cgp)
        project_ref(cgt)
        denom = jnp.sum(cgp[:] * cgt[:])
        alpha = jnp.where(denom != 0, rz / denom, 0.0)
        cgx[:] = cgx[:] + alpha * cgp[:]
        cgr[:] = cgr[:] - alpha * cgt[:]
        z = z_into()
        rz_new = jnp.sum(cgr[:] * z[:])
        beta = jnp.where(rz != 0, rz_new / rz, 0.0)
        cgp[:] = z[:] + beta * cgp[:]
        return rz_new, jnp.sum(cgr[:] * cgr[:])

    if tol > 0:
        def cond(st):
            _, rr, k = st
            return jnp.logical_and(k < iters, rr > atol2)

        def wbody(st):
            rz, _, k = st
            rz, rr = advance(rz)
            return (rz, rr, k + 1)

        jax.lax.while_loop(cond, wbody, (rz0, rr0, jnp.int32(0)))
    else:
        def body(_, st):
            return advance(st[0])

        jax.lax.fori_loop(0, iters, body, (rz0, rr0))
    project_ref(cgx)


def _grid_of(v, ns):
    return v.reshape(ns, ns)


# ---------------------------------------------------------------------------
# Viscous solver
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ViscousGridCG:
    """Drop-in for matfree.ViscousCG on ring-in-grid meshes: solves
    ``(m·(I + dtν·K)·m + (1−m)I) x = b`` per velocity component with
    Jacobi-PCG, whole solve in one Pallas kernel."""

    K: GridOperator
    interior_mask: jnp.ndarray  # (N,)
    dt_nu: float
    iters: int
    tol: float = 0.0
    interpret: bool = False
    batch_cols: bool = True  # run the velocity columns' CGs in lockstep
    # (one plane stream / reduction chain per iteration serves both —
    # halves streamed viscous HBM traffic); False = sequential per-column
    # CGs (the pre-round-4 form; hbm_io always uses it: the ref-carried
    # XL core is single-column)
    stream_diags: bool = False  # diag planes HBM-resident, DMA-streamed
    stream_loop: bool = False  # + fori_loop DMA pipeline over ONE stacked
    # HBM array (O(1) program size; needs ns % 128 == 0)
    roll_cache: bool = True  # dynamic-roll forms: cache the sublane-
    # rolled source plane per distinct row shift so each plane's FMA
    # needs only a dynamic LANE roll (which probes show hides under the
    # DMA stream) — see _make_apply.  Auto-ignored by the static-roll
    # forms and forced off in hbm_io mode (VMEM budget)
    hbm_io: bool = False  # XL mode (auto ≥700k nodes): b/x0/out stay in HBM
    # (DMA'd through 3 VMEM CG scratch planes) and the CG runs ref-carried
    # (_cg_core_ref) — together they cut the kernel's VMEM demand from
    # ~29 plane-equivalents (measured 117.3 MB at ns=1024) to ~12, which
    # is what carries the whole-solve kernels past the 1.05M-node
    # ceiling.  Requires stream_diags (the diag planes cannot be
    # VMEM-resident at these sizes anyway).
    stream_chunk: int = 1  # stream_loop pipeline: planes per async copy
    # (see PressureGridCG.stream_chunk).  Active on the hbm XL core and
    # the sequential-column streamed form; the batched twin keeps 1.

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        m = self.interior_mask
        return m * (x + self.dt_nu * self.K.matvec(m * x)) + (1.0 - m) * x

    @functools.cached_property
    def _solve_fn(self):
        K = self.K
        ns = K.ns
        iters, tol, dt_nu = self.iters, self.tol, self.dt_nu
        interpret = self.interpret
        # interpret mode emulates async copies + HBM refs, so the streamed
        # forms run (and are CI-covered) on CPU too; the ns%128 slice-
        # alignment constraint is hardware-only
        stream = self.stream_diags
        sloop = stream and self.stream_loop and (interpret or ns % 128 == 0)
        hbm = self.hbm_io
        assert not hbm or stream, "hbm_io requires stream_diags"
        # roll cache off in XL mode: its n_groups extra VMEM planes are
        # exactly what hbm_io exists to avoid at ns ≥ 1280
        rc = self.roll_cache and not hbm
        # chunked DMA applies only where apply_K owns the scratch alone:
        # the hbm XL core and the sequential-column streamed form (the
        # batched twin shares the same scratch pair at (ns, ns) shape)
        CH = self.stream_chunk if (sloop and (hbm or not self.batch_cols)) \
            else 1
        apply_K = _make_apply(K.offsets, ns, interpret, stream=stream,
                              stream_loop=sloop, roll_cache=rc, chunk=CH)
        apply_cols = _make_apply_cols(K.offsets, ns, interpret,
                                      stream=stream, stream_loop=sloop,
                                      roll_cache=rc)
        # 0 when the active form rolls statically (no cache required)
        ngrp = max(apply_K.n_groups, apply_cols.n_groups)
        n_rest = K.n_rest

        inv_diag = jnp.where(
            self.interior_mask > 0,
            1.0 / (1.0 + self.dt_nu * self.K.diag()),
            1.0,
        )

        n_off = len(K.offsets)

        def kernel(*refs):
            # streamed layout: [sh, d_0..d_{n_off-1}, gr, gl, sr, sl,
            # vals, mask, invd, b, x0 | out | s0, s1, sem]; non-streamed
            # and stream_loop use one stacked diags ref instead; hbm_io
            # appends [cgx, cgr, cgp, iosem] scratch and re-homes
            # b/x0/out to HBM
            sh = refs[0]
            if stream and not sloop:
                d = refs[1:1 + n_off]
                rest = refs[1 + n_off:]
            else:
                d = refs[1]
                rest = refs[2:]
            if hbm:
                # no mask plane: the 0/1 interior mask is folded into
                # the diag planes and remainder values HOST-SIDE
                # (d′ = m·d·roll(m) — bit-exact for 0/1 masks), which
                # removes both the mask plane and the m·X temporary
                # from the kernel
                gr, gl, sr, sl, vals, invd, b, x0, out = rest[:9]
                scr = rest[9:]
                cgx, cgr, cgp, cgt, iosem = scr[-5:]
                scr = scr[:-5]
                mask = None
            else:
                gr, gl, sr, sl, vals, mask, invd, b, x0, out = rest[:10]
                scr = rest[10:]
            cache = None
            if ngrp and not hbm:
                cache = scr[-1]
                scr = scr[:-1]

            def mv(X):
                m = mask[:]
                KX = apply_K(
                    d, gr, gl, sr, sl, vals, m * X, n_rest, sh=sh,
                    scratch=scr[:2] if scr else None,
                    sem=scr[2] if scr else None, cache=cache,
                )
                return m * (X + dt_nu * KX) + (1.0 - m) * X

            ident = lambda v: v
            jac = lambda r: invd[:] * r
            if hbm:
                from jax.experimental.pallas import tpu as pltpu

                def mv_into(dst, src):
                    # masked-diag form: (I + dtν·mKm)·x with boundary
                    # rows passing x through — d′ rows there are zero,
                    # so x + dtν·0 = x exactly
                    apply_K(
                        d, gr, gl, sr, sl, vals, None, n_rest, sh=sh,
                        scratch=scr[:2] if scr else None,
                        sem=scr[2] if scr else None, acc=dst, x_ref=src,
                    )
                    dst[:] = src[:] + dt_nu * dst[:]

                def z_into():
                    cgt[:] = invd[:] * cgr[:]
                    return cgt

                ident_ref = lambda ref: None

                for c in range(b.shape[0]):
                    # i32 plane index: a python int traces as i64 under
                    # x64 mode and tpu.memref_slice rejects it
                    ci = jnp.int32(c)
                    cp_x = pltpu.make_async_copy(x0.at[ci], cgx,
                                                 iosem.at[jnp.int32(0)])
                    cp_b = pltpu.make_async_copy(b.at[ci], cgp,
                                                 iosem.at[jnp.int32(1)])
                    cp_x.start()
                    cp_b.start()
                    cp_x.wait()
                    cp_b.wait()
                    _cg_core_ref(mv_into, z_into, ident_ref,
                                 cgx, cgr, cgp, cgt, iters, tol)
                    cp_o = pltpu.make_async_copy(cgx, out.at[ci],
                                                 iosem.at[jnp.int32(0)])
                    cp_o.start()
                    cp_o.wait()
                return
            if self.batch_cols:
                # both velocity columns advance in LOCKSTEP: one plane
                # stream / one reduction chain per iteration serves both
                # (round-4 roofline lever b)
                C = b.shape[0]

                def mv_cols(Xs):
                    m = mask[:]
                    KXs = apply_cols(
                        d, gr, gl, sr, sl, vals,
                        tuple(m * Xc for Xc in Xs), n_rest, sh=sh,
                        scratch=scr[:2] if scr else None,
                        sem=scr[2] if scr else None, cache=cache,
                    )
                    return tuple(
                        m * (Xc + dt_nu * KXc) + (1.0 - m) * Xc
                        for Xc, KXc in zip(Xs, KXs)
                    )

                jac_c = lambda r: invd[:] * r
                xs = _cg_core_cols(
                    mv_cols, jac_c,
                    tuple(b[c] for c in range(C)),
                    tuple(x0[c] for c in range(C)), iters, tol,
                )
                for c in range(C):
                    out[c] = xs[c]
            else:
                for c in range(b.shape[0]):
                    out[c] = _cg_core(mv, jac, ident, b[c], x0[c], iters,
                                      tol)

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if hbm:
            # fold the 0/1 interior mask into the operator host-side:
            # d′_g = m ⊙ d_g ⊙ roll(m, offset), remainder values scaled
            # by m[target]·m[source] — bit-exact (masks are exactly 0/1)
            mg = _grid_of(self.interior_mask, ns)
            md = []
            for g, (dy, sft) in enumerate(K.offsets):
                mr = jnp.roll(jnp.roll(mg, -dy, 0), -sft, 1)
                md.append(mg * K.diags[g] * mr)
            diags_eff = jnp.stack(md)
            msrc = jnp.sum((K.gr_rowT @ mg) * K.gr_laneT, axis=1,
                           keepdims=True)
            mtgt = jnp.sum((K.sc_row.T @ mg) * K.sc_laneT, axis=1,
                           keepdims=True)
            vals_eff = K.rest_vals * msrc * mtgt
        else:
            diags_eff = K.diags
            vals_eff = K.rest_vals

        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        grps = ngrp > 0
        if sloop:
            shifts = _shift_table(
                K.offsets, ns, pad_to=_pad_even(n_off, CH) - 2 * CH,
                groups=grps,
            )
            diag_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
            diag_args = [_stacked_padded_diags(diags_eff, CH)]
            buf = (ns, ns) if CH == 1 else (CH, ns, ns)
            scratch_shapes = [
                pltpu.VMEM(buf, K.diags.dtype),
                pltpu.VMEM(buf, K.diags.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        elif stream:
            shifts = _shift_table(K.offsets, ns, groups=grps)
            diag_specs = [
                pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_off)
            ]
            diag_args = [diags_eff[g] for g in range(n_off)]
            scratch_shapes = [
                pltpu.VMEM((ns, ns), K.diags.dtype),
                pltpu.VMEM((ns, ns), K.diags.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            shifts = _shift_table(K.offsets, ns, groups=grps)
            diag_specs = [vmem()]
            diag_args = [diags_eff]
            scratch_shapes = []
        if grps:
            # roll cache: sublane-rolled source planes, 2 column slots
            # (the batched viscous kernel caches per column)
            scratch_shapes = scratch_shapes + [
                pltpu.VMEM((2 * ngrp, ns, ns), K.diags.dtype),
            ]

        hbmspec = lambda: pl.BlockSpec(memory_space=pltpu.HBM)
        if hbm:
            field_specs = [vmem() for _ in range(6)] + [hbmspec(), hbmspec()]
            out_spec = hbmspec()
            scratch_shapes = scratch_shapes + [
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgx
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgr
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgp
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgt (Ap / z)
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            field_specs = [vmem() for _ in range(9)]
            out_spec = vmem()

        def solve2(b_grid, x0_grid):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(b_grid.shape, b_grid.dtype),
                in_specs=[smem()] + diag_specs + field_specs,
                out_specs=out_spec,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT,  # v5e has 128 MiB VMEM;
                    # the 16 MiB default rejects the CG loop's temporaries
                ),
            )(
                shifts, *diag_args,
                K.gr_rowT, K.gr_laneT, K.sc_row, K.sc_laneT, vals_eff,
                *(() if hbm else (_grid_of(self.interior_mask, ns),)),
                _grid_of(inv_diag, ns), b_grid, x0_grid,
            )

        return jax.jit(solve2)

    def solve(self, b: jnp.ndarray, x0: jnp.ndarray | None = None) -> jnp.ndarray:
        ns = self.K.ns
        cols = 1 if b.ndim == 1 else b.shape[1]
        bg = jnp.moveaxis(b.reshape(ns, ns, cols), -1, 0) if b.ndim == 2 else b.reshape(1, ns, ns)
        x0g = (
            jnp.zeros_like(bg)
            if x0 is None
            else (jnp.moveaxis(x0.reshape(ns, ns, cols), -1, 0) if b.ndim == 2 else x0.reshape(1, ns, ns))
        )
        xg = self._solve_fn(bg, x0g)
        if b.ndim == 1:
            return xg.reshape(-1)
        return jnp.moveaxis(xg, 0, -1).reshape(ns * ns, cols)


# ---------------------------------------------------------------------------
# Pressure solver (two-level preconditioner, deflation, periodic merge)
# ---------------------------------------------------------------------------


def _block_pool_matrices(ns: int, target_coarse: int):
    """Separable row/lane block aggregation: Pr (ncr, ns), Pl (ncl, ns)."""
    per_side = max(2, int(round(np.sqrt(target_coarse))))
    b = max(1, int(np.ceil(ns / per_side)))
    nc = int(np.ceil(ns / b))
    P = np.zeros((nc, ns))
    P[np.arange(ns) // b, np.arange(ns)] = 1.0
    return P, P  # same blocking on rows and lanes


@dataclasses.dataclass(frozen=True)
class PressureGridCG:
    """Drop-in for matfree.PressureCG (twolevel) on ring-in-grid meshes."""

    K: GridOperator  # merged periodic pressure operator
    m_lumped: jnp.ndarray  # (N,)
    active_mask: jnp.ndarray  # (N,) 0.0 at slave dofs
    master_mask: jnp.ndarray  # (N,) 1.0 at master (left-edge paired) dofs
    slave_mask: jnp.ndarray  # (N,) 1.0 at slave (right-edge paired) dofs
    iters: int
    # pooling/index matrices, each stored in BOTH orientations a matmul
    # needs — in-kernel .T on an MXU operand trips a libtpu RET_CHECK
    Pr: jnp.ndarray  # (ncr, ns) row pooling
    PrT: jnp.ndarray  # (ns, ncr)
    Pl: jnp.ndarray  # (ncl, ns) lane pooling
    PlT: jnp.ndarray  # (ns, ncl)
    ac_inv: jnp.ndarray  # (nc, nc) regularized coarse inverse
    Fa: jnp.ndarray  # (nc, ncr) one-hot k → k // ncl (Mosaic-safe flatten)
    FaT: jnp.ndarray  # (ncr, nc)
    Fb: jnp.ndarray  # (nc, ncl) one-hot k → k %  ncl
    omega: float
    tol: float = 0.0
    interpret: bool = False
    pair_axis: int = 0  # grid axis along which periodic pairs sit
    use_coarse: bool = True  # False → plain damped-Jacobi preconditioning
    stream_diags: bool = False  # diag planes HBM-resident, DMA-streamed
    stream_loop: bool = False  # + fori_loop DMA pipeline over ONE stacked
    # HBM array (O(1) program size; needs ns % 128 == 0)
    lean: bool | None = None  # None → follow stream_diags.  True moves
    # the once-per-solve rhs prep / slave copy-back to XLA outside the
    # kernel, dropping the ml/mmask/smask VMEM planes (the form the
    # streamed regime always uses); settable independently so the CPU
    # interpret tests cover the lean math without DMA streaming
    hbm_io: bool = False  # XL mode: b/x0/out in HBM + ref-carried CG
    # (see ViscousGridCG.hbm_io).  Requires stream_diags; implies lean.
    roll_cache: bool = True  # dynamic-roll forms: sublane-roll cache
    # (see ViscousGridCG.roll_cache / _make_apply); off in hbm_io mode
    stream_chunk: int = 1  # stream_loop pipeline: planes per async copy
    # (2 halves the DMA issue count — round-5 pressure-floor lever; the
    # chunked pipeline is bit-identical, interpret-tested).  Ignored off
    # the stream_loop form and with precond_bf16 (separate bf16 stream).
    probe: str = ""  # measurement only (roofline.py): "nodma" skips the
    # plane DMAs (times the roll+FMA loop), "nofma" skips the FMAs
    # (times the DMA pipeline alone) — results are WRONG by design
    precond_bf16: bool = False  # streamed two-level only: keep a SECOND
    # bf16 copy of the diag planes in HBM and stream IT for the
    # preconditioner's two K-applies (the CG advance keeps f32) — 2 of
    # the 3 plane streams per iteration at half width ⇒ ~33% less HBM
    # traffic.  Safe: the preconditioner stays a fixed symmetric linear
    # operator (bf16 rounding of a symmetric plane set is symmetric),
    # only its quality changes at the ~0.4% level — same rationale as
    # the bf16 coarse inverse above.  MEASURED FLAT and left off: the
    # chained-dispatch A/B (benchmarks/roofline_ab_r4.jsonl, 410k and
    # 1.05M) shows identical per-iteration time with 33% fewer bytes —
    # the streamed kernels are bound by the per-plane DMA pipeline and
    # in-kernel serialization, not by HBM bytes, so halving plane width
    # buys nothing (yet; it would pay if the pipeline ever reaches the
    # bandwidth roof).

    @classmethod
    def build(
        cls,
        K_merged_csr,
        grid_op: GridOperator,
        m_lumped,
        masters: np.ndarray,
        slaves: np.ndarray,
        active_mask,
        iters: int,
        tol: float = 0.0,
        target_coarse: int = 1024,
        use_coarse: bool = True,
        coarse_dtype=None,
        interpret: bool = False,
        stream_diags: bool = False,
        stream_loop: bool = False,
        hbm_io: bool = False,
        precond_bf16: bool = False,
        roll_cache: bool = True,
        stream_chunk: int = 1,
    ) -> "PressureGridCG":
        from tpufem.solve.cg import estimate_lmax
        from tpufem.solve.twolevel import coarse_inverse, galerkin_coarse

        ns = grid_op.ns
        n = ns * ns
        # the dense coarse inverse lives in VMEM for the whole solve:
        # cap the coarse space so ac_inv stays ≤ ~4 MB (1024² f32) —
        # at 160 nodes/aggregate the preconditioner remains near
        # mesh-independent while 2048 aggregates would cost 16 MB
        target_coarse = min(int(target_coarse), 1024)
        # the roll-based merge/copy-back needs the periodic pairs on
        # opposite edges of ONE grid axis with matching positions along
        # the other (true by construction for generated grids: node id
        # = ix·ns + iy, x-periodic pairs are rows 0 and ns−1)
        pair_axis = 0
        if len(masters):
            mi, mj = np.divmod(np.asarray(masters), ns)
            si, sj = np.divmod(np.asarray(slaves), ns)
            if (mi == 0).all() and (si == ns - 1).all() and (mj == sj).all():
                pair_axis = 0  # paired along the row (leading) axis
            elif (mj == 0).all() and (sj == ns - 1).all() and (mi == si).all():
                pair_axis = 1  # paired along the lane axis
            else:
                raise AssertionError(
                    "pressure grid kernel requires opposite-edge pairing"
                )
        master_mask = np.zeros(n)
        slave_mask = np.zeros(n)
        master_mask[np.asarray(masters, dtype=np.int64)] = 1.0
        slave_mask[np.asarray(slaves, dtype=np.int64)] = 1.0

        Pr, Pl = _block_pool_matrices(ns, target_coarse)
        ncr, ncl = Pr.shape[0], Pl.shape[0]
        iy, ix = np.divmod(np.arange(n), ns)
        agg = (
            np.argmax(Pr[:, iy], axis=0) * ncl + np.argmax(Pl[:, ix], axis=0)
        ).astype(np.int32)
        ac = galerkin_coarse(K_merged_csr, agg, ncr * ncl)
        ac_inv = coarse_inverse(ac)
        # index one-hots: Mosaic has no in-kernel reshape between the
        # (ncr, ncl) coarse image and the flat (nc,) coarse vector
        # ("unsupported shape cast"), so flatten/unflatten become the
        # same one-hot matmul pattern as the operator remainder
        nc = ncr * ncl
        ks = np.arange(nc)
        Fa = np.zeros((nc, ncr))
        Fb = np.zeros((nc, ncl))
        Fa[ks, ks // ncl] = 1.0
        Fb[ks, ks % ncl] = 1.0

        diag = grid_op.diag()
        inv_diag = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 1.0)
        lmax = estimate_lmax(grid_op.matvec, inv_diag, n)

        dtype = grid_op.diags.dtype
        return cls(
            K=grid_op,
            m_lumped=jnp.asarray(m_lumped, dtype=dtype),
            active_mask=jnp.asarray(active_mask, dtype=dtype),
            master_mask=jnp.asarray(master_mask, dtype=dtype),
            slave_mask=jnp.asarray(slave_mask, dtype=dtype),
            iters=iters,
            Pr=jnp.asarray(Pr, dtype=dtype),
            PrT=jnp.asarray(Pr.T.copy(), dtype=dtype),
            Pl=jnp.asarray(Pl, dtype=dtype),
            PlT=jnp.asarray(Pl.T.copy(), dtype=dtype),
            # bf16 coarse inverse: the (nc, nc) coarse matvec is the
            # byte/FLOP-dominant part of one in-kernel preconditioner
            # application; a preconditioner tolerates the ~0.4% rounding
            # (measured on the XLA path: iteration counts unchanged)
            ac_inv=jnp.asarray(ac_inv, dtype=coarse_dtype or dtype),
            Fa=jnp.asarray(Fa, dtype=dtype),
            FaT=jnp.asarray(Fa.T.copy(), dtype=dtype),
            Fb=jnp.asarray(Fb, dtype=dtype),
            omega=1.0 / float(lmax),
            tol=tol,
            interpret=interpret,
            pair_axis=pair_axis,
            use_coarse=use_coarse,
            stream_diags=stream_diags,
            stream_loop=stream_loop,
            hbm_io=hbm_io,
            precond_bf16=precond_bf16 and stream_diags and use_coarse,
            roll_cache=roll_cache,
            stream_chunk=stream_chunk,
        )

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.K.matvec(x)

    @functools.cached_property
    def _solve_fn(self):
        K = self.K
        ns = K.ns
        iters, tol, omega = self.iters, self.tol, self.omega
        interpret = self.interpret
        pair_axis = self.pair_axis
        use_coarse = self.use_coarse
        stream = self.stream_diags  # interpret emulates DMA (see above)
        sloop = stream and self.stream_loop and (interpret or ns % 128 == 0)
        hbm = self.hbm_io
        assert not hbm or stream, "hbm_io requires stream_diags"
        pb16 = self.precond_bf16 and stream and use_coarse
        rc = self.roll_cache and not hbm
        CH = self.stream_chunk if (sloop and not pb16) else 1
        apply_K = _make_apply(K.offsets, ns, interpret, stream=stream,
                              stream_loop=sloop, roll_cache=rc,
                              chunk=CH, probe=self.probe)
        ngrp = apply_K.n_groups
        n_rest = K.n_rest
        ncr, ncl = self.Pr.shape[0], self.Pl.shape[0]

        diag = self.K.diag()
        inv_diag = jnp.where(diag > 0, 1.0 / jnp.where(diag > 0, diag, 1.0), 1.0)

        n_off = len(K.offsets)

        # lean form (streamed regime): the rhs prep (M_L scaling, slave→
        # master merge, masking) and the final master→slave copy touch
        # their planes ONCE per solve — under streaming they move to XLA
        # outside the kernel, dropping the ml/mmask/smask VMEM planes
        # (12 MB at ns=1024; the difference between fitting and OOM at 1M
        # nodes — the measured scoped-VMEM need was 126 MB vs the ~116 MB
        # budget with them resident)
        lean = stream if self.lean is None else self.lean

        def kernel(*refs):
            sh = refs[0]
            if stream and not sloop:
                d = refs[1:1 + n_off]
                k = 1 + n_off
                d16 = refs[k:k + n_off] if pb16 else None
                k += n_off if pb16 else 0
                rest = refs[k:]
            else:
                d = refs[1]
                d16 = refs[2] if pb16 else None
                rest = refs[3 if pb16 else 2:]
            if lean:
                (gr, gl, sr, sl, vals, act, invd, pr, prt, plm, plt,
                 acinv, fa, fat, fb, b, x0, out) = rest[:18]
                scr = rest[18:]
                if hbm:
                    cgx, cgr, cgp, cgt, cgz, iosem = scr[-6:]
                    scr = scr[:-6]
                ml = mmask = smask = None
            else:
                (gr, gl, sr, sl, vals, ml, act, mmask, smask, invd, pr,
                 prt, plm, plt, acinv, fa, fat, fb, b, x0, out) = rest[:21]
                scr = rest[21:]
            cache = None
            if ngrp:
                cache = scr[-1]
                scr = scr[:-1]
            scr16 = scr[3:6] if pb16 else None  # bf16 buffer pair + sem
            ww = jnp.sum(act[:] * act[:])

            def mv(X):
                return apply_K(
                    d, gr, gl, sr, sl, vals, X, n_rest, sh=sh,
                    scratch=scr[:2] if scr else None,
                    sem=scr[2] if scr else None, cache=cache,
                )

            def mvp(X):
                """Preconditioner-side K·x: streams the bf16 plane copy
                when ``precond_bf16`` (accumulation stays f32)."""
                if not pb16:
                    return mv(X)
                return apply_K(
                    d16, gr, gl, sr, sl, vals, X, n_rest, sh=sh,
                    scratch=scr16[:2], sem=scr16[2], cache=cache,
                )

            def project(X):
                a = act[:]
                return X - (jnp.sum(a * X) / ww) * a

            def dot32(a, b_):
                return jnp.dot(a, b_, preferred_element_type=jnp.float32)

            def coarse(T):
                rc = dot32(dot32(pr[:], T), plt[:])  # (ncr, ncl)
                # flatten via index one-hots (no in-kernel reshape):
                # flat[k] = rc[k // ncl, k % ncl]
                flat = jnp.sum(dot32(fa[:], rc) * fb[:], axis=1, keepdims=True)
                ai = acinv[:]
                zc = jnp.dot(ai, flat.astype(ai.dtype),
                             preferred_element_type=jnp.float32)  # (nc, 1)
                zc2 = dot32(fat[:], zc * fb[:])  # (ncr, ncl) unflatten
                Z = dot32(prt[:], dot32(zc2, plm[:]))
                return Z * act[:]

            def precond(r):
                if not use_coarse:
                    return invd[:] * r
                z1 = omega * (invd[:] * r)
                z2 = z1 + coarse(r - mvp(z1))
                return z2 + omega * (invd[:] * (r - mvp(z2)))

            if lean:
                # rhs prep and slave copyback happened outside (XLA)
                if hbm:
                    from jax.experimental.pallas import tpu as pltpu

                    def mv_into(dst, src):
                        apply_K(
                            d, gr, gl, sr, sl, vals, None, n_rest, sh=sh,
                            scratch=scr[:2] if scr else None,
                            sem=scr[2] if scr else None, acc=dst, x_ref=src,
                        )

                    def mvp_into(dst, src):
                        if not pb16:
                            return mv_into(dst, src)
                        apply_K(
                            d16, gr, gl, sr, sl, vals, None, n_rest, sh=sh,
                            scratch=scr16[:2], sem=scr16[2],
                            acc=dst, x_ref=src,
                        )

                    def project_ref(ref):
                        a = act[:]
                        ref[:] = ref[:] - (jnp.sum(a * ref[:]) / ww) * a

                    def z_into():
                        if not use_coarse:
                            cgz[:] = invd[:] * cgr[:]
                        else:
                            cgz[:] = omega * (invd[:] * cgr[:])  # z1
                            mvp_into(cgt, cgz)
                            cgt[:] = cgr[:] - cgt[:]
                            cgz[:] = cgz[:] + coarse(cgt[:])     # z2
                            mvp_into(cgt, cgz)
                            cgz[:] = cgz[:] + omega * (
                                invd[:] * (cgr[:] - cgt[:])
                            )
                        project_ref(cgz)
                        return cgz

                    cp_x = pltpu.make_async_copy(x0, cgx, iosem.at[jnp.int32(0)])
                    cp_b = pltpu.make_async_copy(b, cgp, iosem.at[jnp.int32(1)])
                    cp_x.start()
                    cp_b.start()
                    cp_x.wait()
                    cp_b.wait()
                    _cg_core_ref(mv_into, z_into, project_ref,
                                 cgx, cgr, cgp, cgt, iters, tol)
                    cp_o = pltpu.make_async_copy(cgx, out, iosem.at[jnp.int32(0)])
                    cp_o.start()
                    cp_o.wait()
                    return
                out[:] = _cg_core(
                    mv, precond, project, b[:], x0[:], iters, tol
                )
                return
            # rhs: M_L ∘ b, slave→master edge merge, mask
            to_master = (ns - 1, 0) if pair_axis == 0 else (0, ns - 1)
            to_slave = (1, 0) if pair_axis == 0 else (0, 1)
            rhs = ml[:] * b[:]
            rhs = rhs + _roll2(rhs * smask[:], *to_master, ns, interpret) * mmask[:]
            rhs = rhs * act[:]
            p = _cg_core(mv, precond, project, rhs, x0[:] * act[:], iters, tol)
            # copy master values back onto slaves (reference observable:
            # u[slave] = u[master], StokesColor.py:429-431)
            p = p * (1.0 - smask[:]) + _roll2(p * mmask[:], *to_slave, ns, interpret) * smask[:]
            out[:] = p

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
        grps = ngrp > 0
        if sloop:
            shifts = _shift_table(
                K.offsets, ns, pad_to=_pad_even(n_off, CH) - 2 * CH,
                groups=grps,
            )
            diag_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
            diag_args = [_stacked_padded_diags(K.diags, CH)]
            buf = (ns, ns) if CH == 1 else (CH, ns, ns)
            scratch_shapes = [
                pltpu.VMEM(buf, K.diags.dtype),
                pltpu.VMEM(buf, K.diags.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        elif stream:
            shifts = _shift_table(K.offsets, ns, groups=grps)
            diag_specs = [
                pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(n_off)
            ]
            diag_args = [K.diags[g] for g in range(n_off)]
            scratch_shapes = [
                pltpu.VMEM((ns, ns), K.diags.dtype),
                pltpu.VMEM((ns, ns), K.diags.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            shifts = _shift_table(K.offsets, ns, groups=grps)
            diag_specs = [vmem()]
            diag_args = [K.diags]
            scratch_shapes = []

        if pb16:
            # second, half-width plane stack for the preconditioner's
            # applies + its own double-buffer pair and DMA semaphores
            d16_full = K.diags.astype(jnp.bfloat16)
            if sloop:
                diag_specs = diag_specs + [
                    pl.BlockSpec(memory_space=pltpu.HBM)
                ]
                diag_args = diag_args + [_stacked_padded_diags(d16_full)]
            else:
                diag_specs = diag_specs + [
                    pl.BlockSpec(memory_space=pltpu.HBM)
                    for _ in range(n_off)
                ]
                diag_args = diag_args + [d16_full[g] for g in range(n_off)]
            scratch_shapes = scratch_shapes + [
                pltpu.VMEM((ns, ns), jnp.bfloat16),
                pltpu.VMEM((ns, ns), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        if grps:
            # roll cache (single-field kernel: one column slot)
            scratch_shapes = scratch_shapes + [
                pltpu.VMEM((ngrp, ns, ns), K.diags.dtype),
            ]

        n_planes = 17 if lean else 20
        assert not hbm or lean, "hbm_io requires the lean kernel form"
        hbmspec = lambda: pl.BlockSpec(memory_space=pltpu.HBM)
        if hbm:
            field_specs = [vmem() for _ in range(15)] + [hbmspec(), hbmspec()]
            out_spec = hbmspec()
            scratch_shapes = scratch_shapes + [
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgx
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgr
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgp
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgt (Ap / t)
                pltpu.VMEM((ns, ns), K.diags.dtype),  # cgz (z1/z2/z)
                pltpu.SemaphoreType.DMA((2,)),
            ]
        else:
            field_specs = [vmem() for _ in range(n_planes)]
            out_spec = vmem()

        def _call(rhs_grid, x0_grid):
            args = [
                shifts, *diag_args,
                K.gr_rowT, K.gr_laneT, K.sc_row, K.sc_laneT, K.rest_vals,
            ]
            if not lean:
                args += [
                    _grid_of(self.m_lumped, ns),
                    _grid_of(self.active_mask, ns),
                    _grid_of(self.master_mask, ns),
                    _grid_of(self.slave_mask, ns),
                ]
            else:
                args += [_grid_of(self.active_mask, ns)]
            args += [
                _grid_of(inv_diag, ns), self.Pr, self.PrT, self.Pl,
                self.PlT, self.ac_inv, self.Fa, self.FaT, self.Fb,
                rhs_grid, x0_grid,
            ]
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((ns, ns), rhs_grid.dtype),
                in_specs=[smem()] + diag_specs + field_specs,
                out_specs=out_spec,
                scratch_shapes=scratch_shapes,
                interpret=interpret,
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT,
                ),
            )(*args)

        if not lean:
            return jax.jit(_call)

        to_master = (ns - 1, 0) if pair_axis == 0 else (0, ns - 1)
        to_slave = (1, 0) if pair_axis == 0 else (0, 1)

        def roll(X, dy, s):
            # XLA twin of the in-kernel _roll2 (same index convention)
            return jnp.roll(jnp.roll(X, -dy, -2), -s, -1)

        def solve1(b_grid, x0_grid):
            ml = _grid_of(self.m_lumped, ns)
            act = _grid_of(self.active_mask, ns)
            mm = _grid_of(self.master_mask, ns)
            sm = _grid_of(self.slave_mask, ns)
            rhs = ml * b_grid
            rhs = rhs + roll(rhs * sm, *to_master) * mm
            rhs = rhs * act
            p = _call(rhs, x0_grid * act)
            return p * (1.0 - sm) + roll(p * mm, *to_slave) * sm

        return jax.jit(solve1)

    def solve(self, b: jnp.ndarray, x0: jnp.ndarray | None = None) -> jnp.ndarray:
        ns = self.K.ns
        bg = b.reshape(ns, ns)
        x0g = jnp.zeros_like(bg) if x0 is None else x0.reshape(ns, ns)
        return self._solve_fn(bg, x0g).reshape(-1)


# ---------------------------------------------------------------------------
# Nonsymmetric viscous solver (Navier–Stokes implicit advection)
# ---------------------------------------------------------------------------


def _bicgstab_core(matvec, precond, b, x0, iters: int, tol: float):
    """Single-field right-preconditioned BiCGStab, the exact
    ``solve/cg.py bicgstab_fixed`` algorithm (finite-or-zero breakdown
    guards) traced inside the kernel, plus an optional early-exit
    ``while_loop`` on the true residual (``tol > 0``) — with warm starts
    the near-steady NS velocity solves finish far under the cap."""

    def fin(v):
        return jnp.where(jnp.isfinite(v), v, jnp.zeros_like(v))

    r0 = b - matvec(x0)
    rhat = r0
    atol2 = (tol * jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-30)) ** 2

    def advance(x, r, p, v, rho, alpha, omega):
        rho_new = jnp.sum(rhat * r)
        beta = fin(jnp.where(
            (rho != 0) & (omega != 0), (rho_new / rho) * (alpha / omega), 0.0
        ))
        p = r + beta * (p - omega * v)
        phat = precond(p)
        v = matvec(phat)
        denom = jnp.sum(rhat * v)
        alpha = fin(jnp.where(denom != 0, rho_new / denom, 0.0))
        s = r - alpha * v
        shat = precond(s)
        t = matvec(shat)
        tt = jnp.sum(t * t)
        omega = fin(jnp.where(tt != 0, jnp.sum(t * s) / tt, 0.0))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        return x, r, p, v, rho_new, alpha, omega

    one = jnp.asarray(1.0, dtype=b.dtype)
    zeros = jnp.zeros_like(b)
    st0 = (x0, r0, zeros, zeros, one, one, one)
    if tol > 0:
        def cond(st):
            state, k = st
            return jnp.logical_and(k < iters, jnp.sum(state[1] * state[1]) > atol2)

        def wbody(st):
            state, k = st
            return advance(*state), k + 1

        st, _ = jax.lax.while_loop(cond, wbody, (st0, jnp.int32(0)))
        return st[0]

    def body(_, state):
        return advance(*state)

    x, *_ = jax.lax.fori_loop(0, iters, body, st0)
    return x


def _bicgstab_core_cols(matvec, precond, b, x0, iters: int, tol: float):
    """_bicgstab_core over C independent columns in LOCKSTEP — the
    BiCGStab twin of :func:`_cg_core_cols`: state is a TUPLE of C
    (ns, ns) planes, scalars are per-column (python-unrolled), one
    ``matvec`` call (two per BiCGStab iteration) serves all columns.
    Halves the per-iteration reduction/dependency chain the round-4
    roofline measured as the all-VMEM kernels' binding constraint."""
    C = len(b)

    def fin(v):
        return jnp.where(jnp.isfinite(v), v, jnp.zeros_like(v))

    def tmap(f, *ts):
        return tuple(f(*xs) for xs in zip(*ts))

    r0 = tmap(lambda bc, ac: bc - ac, b, matvec(x0))
    rhat = r0
    atol2 = tuple(
        (tol * jnp.maximum(jnp.sqrt(jnp.sum(bc * bc)), 1e-30)) ** 2
        for bc in b
    )

    def advance(x, r, p, v, rho, alpha, omega):
        rho_new = tuple(jnp.sum(rh * rc) for rh, rc in zip(rhat, r))
        beta = tuple(
            fin(jnp.where((rc != 0) & (oc != 0),
                          (rnc / rc) * (ac / oc), 0.0))
            for rc, oc, rnc, ac in zip(rho, omega, rho_new, alpha)
        )
        p = tmap(lambda rc, bc, pc, oc, vc: rc + bc * (pc - oc * vc),
                 r, beta, p, omega, v)
        phat = tuple(precond(pc) for pc in p)
        v = matvec(phat)
        denom = tuple(jnp.sum(rh * vc) for rh, vc in zip(rhat, v))
        alpha = tuple(
            fin(jnp.where(dc != 0, rnc / dc, 0.0))
            for dc, rnc in zip(denom, rho_new)
        )
        s = tmap(lambda rc, ac, vc: rc - ac * vc, r, alpha, v)
        shat = tuple(precond(sc) for sc in s)
        t = matvec(shat)
        tt = tuple(jnp.sum(tc * tc) for tc in t)
        omega = tuple(
            fin(jnp.where(ttc != 0, jnp.sum(tc * sc) / ttc, 0.0))
            for ttc, tc, sc in zip(tt, t, s)
        )
        x = tmap(lambda xc, ac, ph, oc, sh_: xc + ac * ph + oc * sh_,
                 x, alpha, phat, omega, shat)
        r = tmap(lambda sc, oc, tc: sc - oc * tc, s, omega, t)
        return x, r, p, v, rho_new, alpha, omega

    one = jnp.asarray(1.0, dtype=b[0].dtype)
    ones = (one,) * C
    zeros = tuple(jnp.zeros_like(bc) for bc in b)
    st0 = (x0, r0, zeros, zeros, ones, ones, ones)
    if tol > 0:
        def cond(st):
            state, k = st
            r = state[1]
            live = [jnp.sum(rc * rc) > at for rc, at in zip(r, atol2)]
            any_live = live[0]
            for l in live[1:]:
                any_live = jnp.logical_or(any_live, l)
            return jnp.logical_and(k < iters, any_live)

        def wbody(st):
            state, k = st
            return advance(*state), k + 1

        st, _ = jax.lax.while_loop(cond, wbody, (st0, jnp.int32(0)))
        return st[0]

    def body(_, state):
        return advance(*state)

    x, *_ = jax.lax.fori_loop(0, iters, body, st0)
    return x


def _bicgstab_core_ref(mv_into, precond_into, x, r, rhat, p, v, t1, t2,
                       iters: int, tol: float):
    """``_bicgstab_core`` with FULLY ref-resident state — the BiCGStab
    twin of :func:`_cg_core_ref` (same motivation: the SSA form's loop
    carries pin ~8 planes per column and Mosaic's register allocator
    spills them into VMEM — 78 MB measured on the value-carried viscous
    kernel at ns=896, a compile-time OOM).

    Arithmetic order matches :func:`_bicgstab_core` exactly (finite-or-
    zero breakdown guards included) — bit-identical in interpret mode.

    Contracts: on entry ``x`` holds x0 and ``r`` holds b; on exit ``x``
    holds the solution.  ``mv_into(dst, src)`` writes A·src[:] into
    ``dst`` reading the source per use; ``precond_into(dst, src)``
    writes the (Jacobi) preconditioner application.  ``rhat``/``p``/
    ``v``/``t1``/``t2`` are solver-owned scratch planes."""

    def fin(s):
        return jnp.where(jnp.isfinite(s), s, jnp.zeros_like(s))

    atol2 = (tol * jnp.maximum(jnp.sqrt(jnp.sum(r[:] * r[:])), 1e-30)) ** 2
    mv_into(t1, x)
    r[:] = r[:] - t1[:]  # r0 = b − A·x0
    rhat[:] = r[:]
    p[:] = jnp.zeros_like(r[:])
    v[:] = jnp.zeros_like(r[:])
    rr0 = jnp.sum(r[:] * r[:])

    def advance(rho, alpha, omega):
        rho_new = jnp.sum(rhat[:] * r[:])
        beta = fin(jnp.where(
            (rho != 0) & (omega != 0), (rho_new / rho) * (alpha / omega), 0.0
        ))
        p[:] = r[:] + beta * (p[:] - omega * v[:])
        precond_into(t1, p)  # phat
        mv_into(v, t1)
        denom = jnp.sum(rhat[:] * v[:])
        alpha = fin(jnp.where(denom != 0, rho_new / denom, 0.0))
        r[:] = r[:] - alpha * v[:]  # s
        x[:] = x[:] + alpha * t1[:]  # x += α·phat (phat still in t1)
        precond_into(t1, r)  # shat
        mv_into(t2, t1)  # t
        tt = jnp.sum(t2[:] * t2[:])
        omega = fin(jnp.where(tt != 0, jnp.sum(t2[:] * r[:]) / tt, 0.0))
        x[:] = x[:] + omega * t1[:]
        r[:] = r[:] - omega * t2[:]
        return rho_new, alpha, omega, jnp.sum(r[:] * r[:])

    one = jnp.asarray(1.0, dtype=rr0.dtype)
    if tol > 0:
        def cond(st):
            _, _, _, rr, k = st
            return jnp.logical_and(k < iters, rr > atol2)

        def wbody(st):
            rho, alpha, omega, _, k = st
            rho, alpha, omega, rr = advance(rho, alpha, omega)
            return (rho, alpha, omega, rr, k + 1)

        jax.lax.while_loop(cond, wbody, (one, one, one, rr0, jnp.int32(0)))
    else:
        def body(_, st):
            rho, alpha, omega, _ = st
            return advance(rho, alpha, omega)

        jax.lax.fori_loop(0, iters, body, (one, one, one, rr0))


@dataclasses.dataclass(frozen=True)
class NSGridBiCGStab:
    """Whole-solve kernel for the NS implicit-advection velocity system
    ``(m·(I + Δt·C(u) + νΔt·K)·m + (1−m)I) x = b`` — NONSYMMETRIC (the
    per-step advection C(u)), Jacobi-BiCGStab, both components in one
    ``pallas_call``.

    Unlike :class:`ViscousGridCG` the operator CHANGES EVERY STEP, so the
    (A − I) diag planes / remainder values / Jacobi diagonal are RUNTIME
    ARGUMENTS of :meth:`solve` (refilled per step by
    ``ops/gridop.GridRefill`` — one segment-sum, then every BiCGStab
    iteration is shift-FMA in VMEM).  Replaces the reference's per-step
    dense rebuild+``np.linalg.solve``
    (``/root/reference/scripts/operator_spitting_ns.py:557-604``) in the
    ≥26k-node regime.  Static config only in this dataclass — offsets,
    sizes, iteration cap, tolerance."""

    ns: int
    offsets: tuple  # static (dy, s) python ints — the GridRefill template's
    n_rest: int
    iters: int
    tol: float = 0.0
    interpret: bool = False
    batch_cols: bool = True  # lockstep column BiCGStabs (one matvec pair
    # per iteration serves both velocity components — see _cg_core_cols)
    stream_diags: bool = False  # diag planes HBM-resident, DMA-streamed
    # through a double-buffered VMEM pair.  Unlike ViscousGridCG the
    # planes are RUNTIME values (refilled per step), so only the
    # stacked-array fori_loop pipeline form exists (the per-step stack
    # costs one extra plane-set write — negligible against the
    # per-iteration stream) and it needs ns % 128 == 0 (tile-aligned
    # plane slices of the stacked ref).  This is what takes the NS grid
    # kernels past the ~160k all-VMEM ceiling (diags no longer resident).
    roll_cache: bool = True  # dynamic-roll forms: sublane-roll cache
    # (see ViscousGridCG.roll_cache / _make_apply)
    hbm_io: bool = False  # XL mode (auto ≥700k nodes): b/x0/out stay in
    # HBM (DMA'd through the ref-carried solver's scratch planes) and the
    # BiCGStab runs ref-carried (_bicgstab_core_ref: x/r/rhat/p/v + 2
    # temps in explicit VMEM scratch, scalar-only loop carries) —
    # sequential columns, mask must be ALL-ONES (the NS velocity system
    # applies wall BCs after the projection, workloads/navier_stokes.py
    # passes ones_mask by construction).  Requires/implies stream_diags.

    @functools.cached_property
    def _solve_fn(self):
        ns, n_rest = self.ns, self.n_rest
        iters, tol, interpret = self.iters, self.tol, self.interpret
        hbm = self.hbm_io
        stream = self.stream_diags or hbm
        assert not stream or interpret or ns % 128 == 0, (
            "streamed NS kernels need tile-aligned planes (ns % 128 == 0)"
        )
        # roll cache off in XL mode (its n_groups extra VMEM planes are
        # what hbm_io exists to avoid)
        rc = self.roll_cache and not hbm
        apply_K = _make_apply(self.offsets, ns, interpret, stream=stream,
                              stream_loop=stream,
                              roll_cache=rc)
        apply_cols = _make_apply_cols(self.offsets, ns, interpret,
                                      stream=stream, stream_loop=stream,
                                      roll_cache=rc)
        ngrp = max(apply_K.n_groups, apply_cols.n_groups)
        # host numpy, converted per-trace inside solve2: this property is
        # first evaluated INSIDE an outer jit trace (the NS step), where a
        # cached jnp constant would be a leaked tracer on the next trace
        pad_to = (_pad_even(len(self.offsets)) - 2) if stream else 0
        sh_np = _shift_rows(self.offsets, ns, pad_to=pad_to,
                            groups=ngrp > 0)

        def kernel_hbm(sh, d, gr, gl, sr, sl, vals, invd, b, x0, out,
                       *scr):
            # XL layout: b/x0/out in HBM; CG state in explicit VMEM
            # scratch; mask dropped (all-ones contract — see hbm_io)
            from jax.experimental.pallas import tpu as pltpu

            kx, kr, krh, kp, kv, kt1, kt2, iosem = scr[-8:]
            scr = scr[:-8]

            def mv_into(dst, src):
                apply_K(d, gr, gl, sr, sl, vals, None, n_rest, sh=sh,
                        scratch=scr[:2] if scr else None,
                        sem=scr[2] if scr else None, acc=dst, x_ref=src)
                dst[:] = src[:] + dst[:]

            def precond_into(dst, src):
                dst[:] = invd[:] * src[:]

            for c in range(b.shape[0]):
                ci = jnp.int32(c)  # i32: python ints trace i64 under x64
                cp_x = pltpu.make_async_copy(x0.at[ci], kx,
                                             iosem.at[jnp.int32(0)])
                cp_b = pltpu.make_async_copy(b.at[ci], kr,
                                             iosem.at[jnp.int32(1)])
                cp_x.start()
                cp_b.start()
                cp_x.wait()
                cp_b.wait()
                _bicgstab_core_ref(mv_into, precond_into,
                                   kx, kr, krh, kp, kv, kt1, kt2,
                                   iters, tol)
                cp_o = pltpu.make_async_copy(kx, out.at[ci],
                                             iosem.at[jnp.int32(0)])
                cp_o.start()
                cp_o.wait()

        def kernel(sh, d, gr, gl, sr, sl, vals, mask, invd, b, x0, out,
                   *scr):
            cache = None
            if ngrp:
                cache = scr[-1]
                scr = scr[:-1]

            def mv(X):
                m = mask[:]
                KX = apply_K(d, gr, gl, sr, sl, vals, m * X, n_rest, sh=sh,
                             scratch=scr[:2] if scr else None,
                             sem=scr[2] if scr else None, cache=cache)
                return m * (X + KX) + (1.0 - m) * X

            jac = lambda r: invd[:] * r
            if self.batch_cols:
                C = b.shape[0]

                def mv_cols(Xs):
                    m = mask[:]
                    KXs = apply_cols(
                        d, gr, gl, sr, sl, vals,
                        tuple(m * Xc for Xc in Xs), n_rest, sh=sh,
                        scratch=scr[:2] if scr else None,
                        sem=scr[2] if scr else None, cache=cache,
                    )
                    return tuple(
                        m * (Xc + KXc) + (1.0 - m) * Xc
                        for Xc, KXc in zip(Xs, KXs)
                    )

                xs = _bicgstab_core_cols(
                    mv_cols, jac,
                    tuple(b[c] for c in range(C)),
                    tuple(x0[c] for c in range(C)), iters, tol,
                )
                for c in range(C):
                    out[c] = xs[c]
            else:
                for c in range(b.shape[0]):
                    out[c] = _bicgstab_core(mv, jac, b[c], x0[c], iters,
                                            tol)

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

        hbmspec = lambda: pl.BlockSpec(memory_space=pltpu.HBM)

        def solve2(diags, gr, gl, sr, sl, vals, mask_g, invd_g, b_grid,
                   x0_grid):
            if stream:
                diag_arg = _stacked_padded_diags(diags)
                diag_spec = hbmspec()
                scratch_shapes = [
                    pltpu.VMEM((ns, ns), diags.dtype),
                    pltpu.VMEM((ns, ns), diags.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
            else:
                diag_arg = diags
                diag_spec = vmem()
                scratch_shapes = []
            if hbm:
                scratch_shapes = scratch_shapes + [
                    pltpu.VMEM((ns, ns), diags.dtype)  # x r rhat p v t1 t2
                    for _ in range(7)
                ] + [pltpu.SemaphoreType.DMA((2,))]
                return pl.pallas_call(
                    kernel_hbm,
                    out_shape=jax.ShapeDtypeStruct(b_grid.shape,
                                                   b_grid.dtype),
                    in_specs=[smem(), diag_spec] + [vmem()] * 6
                    + [hbmspec(), hbmspec()],
                    out_specs=hbmspec(),
                    scratch_shapes=scratch_shapes,
                    interpret=interpret,
                    compiler_params=None if interpret
                    else pltpu.CompilerParams(
                        vmem_limit_bytes=_VMEM_LIMIT,
                    ),
                )(jnp.asarray(sh_np), diag_arg, gr, gl, sr, sl, vals,
                  invd_g, b_grid, x0_grid)
            if ngrp:
                # roll cache, 2 column slots (batched BiCGStab)
                scratch_shapes = scratch_shapes + [
                    pltpu.VMEM((2 * ngrp, ns, ns), diags.dtype),
                ]
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(b_grid.shape, b_grid.dtype),
                in_specs=[smem(), diag_spec] + [vmem()] * 9,
                out_specs=vmem(),
                scratch_shapes=scratch_shapes,
                interpret=interpret,
                compiler_params=None if interpret else pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT,
                ),
            )(jnp.asarray(sh_np), diag_arg, gr, gl, sr, sl, vals, mask_g,
              invd_g, b_grid, x0_grid)

        return jax.jit(solve2)

    def solve(self, op: GridOperator, interior_mask: jnp.ndarray,
              inv_diag: jnp.ndarray, b: jnp.ndarray,
              x0: jnp.ndarray) -> jnp.ndarray:
        """``op``: the CURRENT (A − I) operator (dt·C(u) + νdt·K planes,
        refilled this step).  ``b``/``x0``: (N, 2)."""
        ns = self.ns
        cols = b.shape[1]
        bg = jnp.moveaxis(b.reshape(ns, ns, cols), -1, 0)
        x0g = jnp.moveaxis(x0.reshape(ns, ns, cols), -1, 0)
        xg = self._solve_fn(
            op.diags, op.gr_rowT, op.gr_laneT, op.sc_row, op.sc_laneT,
            op.rest_vals, _grid_of(interior_mask, ns), _grid_of(inv_diag, ns),
            bg, x0g,
        )
        return jnp.moveaxis(xg, 0, -1).reshape(ns * ns, cols)

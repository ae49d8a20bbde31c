"""Space-sharded grid-offset CG: the multi-chip form of the VMEM kernels.

Round 2's distributed paths all used the CSR/stencil XLA forms; this
module shards the *grid-offset* operator decomposition
(:class:`tpufem.ops.gridop.GridOperator`) over the "space" axis of a
device mesh — the natural multi-chip form of the whole-solve Pallas
kernels (TODO r2; VERDICT r2 next #5):

* the (ns, ns) grid image is partitioned into row strips, one per
  device;
* each offset application needs only a ``dmax = max|dy|``-row halo from
  the ring neighbors — exchanged once per matvec with two ``ppermute``
  calls (the cyclic ring reproduces the mod-ns row roll exactly,
  including the periodic-x wrap, because the grid rows are cyclic by
  construction);
* lane rolls stay strip-local; CG dot products are ``psum`` scalars;
* the one-hot MXU remainder splits into a column-sharded gather
  (one (Mp, 1) psum for the source reads) and a row-sharded scatter;
* the separable two-level preconditioner restricts with column-sharded
  pooling (one small (ncr, ncl) psum) and prolongs row-locally.

Numerics equal the single-device grid solvers up to reduction order
(equality-tested in tests/test_parallel.py).  On real multi-chip
hardware the upgrade path is in-kernel remote DMA for the halo strips;
on the virtual CPU mesh this XLA-collective form validates the
sharding layout and the math.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P

from tpufem.solve.pallas_cg import PressureGridCG, ViscousGridCG


def _signed_dy(dy: int, ns: int) -> int:
    """Nearest-zero representative of a row offset (ns−1 ≡ −1)."""
    return ((dy + ns // 2) % ns) - ns // 2


def _halo_exchange(x_local, d: int, n_shards: int, axis: str):
    """(h, ns) strip → (h+2d, ns) with d rows from each ring neighbor."""
    if d == 0:
        return x_local
    fwd = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    bwd = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    from_prev = jax.lax.ppermute(x_local[-d:], axis, fwd)
    from_next = jax.lax.ppermute(x_local[:d], axis, bwd)
    return jnp.concatenate([from_prev, x_local, from_next], axis=0)


def _roll_rows(x_local, dy: int, halo_fn):
    """out[iy] = X[(iy+dy) mod ns] across strips, |dy| ≤ 1 (the periodic
    merge / copy-back rolls of the pressure solve)."""
    h = x_local.shape[0]
    xh = halo_fn(x_local, 1)
    return xh[1 + dy : 1 + dy + h]


def make_sharded_grid_solvers(
    device_mesh: DeviceMesh, problem, axis: str = "space",
    halo: str = "ppermute",
):
    """(visc_solve, pressure_solve) sharded over ``axis``.

    ``problem`` must hold grid solvers (``cg_storage="grid"`` /
    ``"grid_interpret"``).  Returns jitted ``visc_solve(b (N,2)) →
    (N,2)`` and ``pressure_solve(b (N,)) → (N,)`` matching the
    single-device ``ViscousGridCG.solve`` / ``PressureGridCG.solve``
    with zero initial guesses and fixed iteration counts.

    ``halo``: ``"ppermute"`` (XLA collectives, the validated virtual-mesh
    form) or ``"rdma"`` (in-kernel Pallas remote DMA,
    :mod:`tpufem.parallel.grid_remote_dma` — bit-equal by construction,
    interpret-emulated off-TPU)."""
    visc: ViscousGridCG = problem.visc_solver
    pres: PressureGridCG = problem.pressure_solver
    Kv, Kp = visc.K, pres.K
    ns = Kv.ns
    s_ = device_mesh.shape[axis]
    assert ns % s_ == 0, f"ns={ns} must divide over {s_} shards"
    h = ns // s_

    sdy_v = [_signed_dy(dy, ns) for dy, _ in Kv.offsets]
    sdy_p = [_signed_dy(dy, ns) for dy, _ in Kp.offsets]
    dmax = max(
        [abs(d) for d in sdy_v] + [abs(d) for d in sdy_p] + [1]
    )

    if halo == "rdma":
        from tpufem.parallel.grid_remote_dma import make_halo_rdma

        halo_fn = make_halo_rdma(axis)
    else:
        halo_fn = lambda x_loc, dd: _halo_exchange(x_loc, dd, s_, axis)
    assert h > dmax, (
        f"strip height {h} must exceed the halo depth {dmax} — "
        "use fewer shards or a larger mesh"
    )

    dt_nu = visc.dt_nu
    iters_v, iters_p = visc.iters, pres.iters
    # tolerance early-exit inherited from the single-device solvers
    # (psum'd residual test — SPMD-uniform; iters become the cap)
    tol_v, tol_p = visc.tol, pres.tol
    omega, use_coarse = pres.omega, pres.use_coarse
    assert pres.pair_axis == 0, (
        "sharded grid CG assumes row-axis periodic pairs"
    )
    ncr, ncl = pres.Pr.shape[0], pres.Pl.shape[0]

    def grid(v):
        return jnp.asarray(np.asarray(v).reshape(ns, ns))

    invd_v = jnp.where(
        visc.interior_mask > 0, 1.0 / (1.0 + dt_nu * Kv.diag()), 1.0
    )
    dp = Kp.diag()
    invd_p = jnp.where(dp > 0, 1.0 / jnp.where(dp > 0, dp, 1.0), 1.0)

    def make_apply(diags_loc, grT_loc, gl, sc_loc, slane, vals, sdy, offsets,
                   n_rest):
        """K·x on a local (h, ns) strip (one halo exchange per call)."""

        def apply(x_loc):
            xh = halo_fn(x_loc, dmax)
            y = jnp.zeros_like(x_loc)
            for g, ((_, s), dy) in enumerate(zip(offsets, sdy)):
                y = y + diags_loc[g] * jnp.roll(
                    xh[dmax + dy : dmax + dy + h], -s, axis=1
                )
            if n_rest:
                t = grT_loc @ x_loc  # (Mp, ns); rows owned by this shard
                xs = jax.lax.psum(
                    jnp.sum(t * gl, axis=1, keepdims=True), axis
                )
                y = y + sc_loc @ (vals * xs * slane)
            return y

        return apply

    def psum_dot(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis)

    def cg(matvec, precond, project, b, iters, tol=0.0):
        """_cg_core with psum dots, x0 = 0.  ``tol > 0`` runs the same
        early-exit while_loop as the single-device kernels: the exit
        test is a psum'd residual norm, so every shard sees the same
        boolean and the loop stays SPMD-uniform."""
        b = project(b)
        x = jnp.zeros_like(b)
        r = b
        z = project(precond(r))
        rz = psum_dot(r, z)

        def advance(x, r, p, rz):
            ap = project(matvec(p))
            denom = psum_dot(p, ap)
            alpha = jnp.where(denom != 0, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = project(precond(r))
            rz_new = psum_dot(r, z)
            beta = jnp.where(rz != 0, rz_new / rz, 0.0)
            return x, r, z + beta * p, rz_new

        if tol > 0:
            atol2 = (tol * jnp.maximum(jnp.sqrt(psum_dot(b, b)), 1e-30)) ** 2

            def cond(st):
                _, r, _, _, k = st
                return jnp.logical_and(k < iters, psum_dot(r, r) > atol2)

            def wbody(st):
                x, r, p, rz, k = st
                x, r, p, rz = advance(x, r, p, rz)
                return (x, r, p, rz, k + 1)

            x, *_ = jax.lax.while_loop(
                cond, wbody, (x, r, z, rz, jnp.int32(0))
            )
            return project(x)

        def body(state, _):
            return advance(*state), None

        (x, *_), _ = jax.lax.scan(body, (x, r, z, rz), None, length=iters)
        return project(x)

    ident = lambda v: v
    row_spec = P(axis, None)

    @partial(
        shard_map, mesh=device_mesh,
        in_specs=(
            P(None, axis, None),  # diags (n_off, ns, ns)
            P(None, axis),  # gr_rowT (Mp, ns) → (Mp, h)
            row_spec,  # sc_row (ns, Mp)
            row_spec,  # interior mask
            row_spec,  # jacobi
            P(None, axis, None),  # b (2, ns, ns)
        ),
        out_specs=P(None, axis, None),
        check_vma=False,
    )
    def visc_sm(dv, grv, scv, mask, invd, b):
        apply_k = make_apply(
            dv, grv, Kv.gr_laneT, scv, Kv.sc_laneT, Kv.rest_vals,
            sdy_v, Kv.offsets, Kv.n_rest,
        )

        def mv(x):
            kx = apply_k(mask * x)
            return mask * (x + dt_nu * kx) + (1.0 - mask) * x

        return jnp.stack(
            [
                cg(mv, lambda r: invd * r, ident, b[c], iters_v, tol_v)
                for c in range(b.shape[0])
            ]
        )

    @partial(
        shard_map, mesh=device_mesh,
        in_specs=(
            P(None, axis, None),  # diags
            P(None, axis),  # gr_rowT
            row_spec,  # sc_row
            row_spec, row_spec, row_spec, row_spec, row_spec,  # ml act mm sm invd
            P(None, axis),  # Pr (ncr, ns) → (ncr, h)
            row_spec,  # PrT (ns, ncr) → (h, ncr)
            row_spec,  # b (ns, ns)
        ),
        out_specs=row_spec,
        check_vma=False,
    )
    def pres_sm(dpv, grp, scp, ml, act, mm, sm, invd, pr, prT, b):
        apply_k = make_apply(
            dpv, grp, Kp.gr_laneT, scp, Kp.sc_laneT, Kp.rest_vals,
            sdy_p, Kp.offsets, Kp.n_rest,
        )
        ww = jax.lax.psum(jnp.sum(act * act), axis)

        def project(x):
            return x - (jax.lax.psum(jnp.sum(act * x), axis) / ww) * act

        def coarse(t):
            rc = jax.lax.psum(pr @ t @ pres.PlT, axis)  # (ncr, ncl)
            flat = rc.reshape(ncr * ncl, 1)
            ai = pres.ac_inv
            zc = jnp.dot(ai, flat.astype(ai.dtype),
                         preferred_element_type=jnp.float32)
            z2 = zc.astype(t.dtype).reshape(ncr, ncl) @ pres.Pl  # (ncr, ns)
            return (prT @ z2) * act

        def precond(r):
            if not use_coarse:
                return invd * r
            z1 = omega * (invd * r)
            z2 = z1 + coarse(r - apply_k(z1))
            return z2 + omega * (invd * (r - apply_k(z2)))

        # rhs: M_L ∘ b, slave edge merged onto master edge (row roll −1)
        rhs = ml * b
        rhs = rhs + _roll_rows(rhs * sm, -1, halo_fn) * mm
        rhs = rhs * act
        p = cg(apply_k, precond, project, rhs, iters_p, tol_p)
        # copy the master row back onto the slave row (row roll +1)
        return p * (1.0 - sm) + _roll_rows(p * mm, 1, halo_fn) * sm

    @jax.jit
    def visc_solve(b):  # (N, 2) → (N, 2)
        bg = jnp.moveaxis(b.reshape(ns, ns, 2), -1, 0)
        x = visc_sm(
            Kv.diags, Kv.gr_rowT, Kv.sc_row,
            grid(visc.interior_mask), grid(invd_v), bg,
        )
        return jnp.moveaxis(x, 0, -1).reshape(ns * ns, 2)

    @jax.jit
    def pressure_solve(b):  # (N,) → (N,)
        p = pres_sm(
            Kp.diags, Kp.gr_rowT, Kp.sc_row,
            grid(pres.m_lumped), grid(pres.active_mask),
            grid(pres.master_mask), grid(pres.slave_mask), grid(invd_p),
            pres.Pr, pres.PrT, b.reshape(ns, ns),
        )
        return p.reshape(-1)

    return visc_solve, pressure_solve

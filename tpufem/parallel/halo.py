"""Halo-exchange distributed SpMV/CG over RCM-banded operators.

The banded storage (ops/banded.py) makes a *true* halo exchange possible:
after RCM reordering the operator has bandwidth b, so a contiguous row
block only ever reads x-values within b rows of its own block.  Partition
rows into equal blocks (block size > b) across the "space" axis and each
CG iteration exchanges just the two b-wide boundary strips with the left/
right neighbor via ``ppermute`` — O(b) communication per device instead
of the O(N) ``all_gather`` in parallel/dist_cg.py.  This is the PDE halo
exchange SURVEY.md §5 maps context-parallelism onto, riding ICI
neighbor links.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P

from tpufem.ops.banded import BandedOperator


def _block_layout(band: BandedOperator, s: int):
    n = band.n
    bw = band.bandwidth
    rows = -(-n // s)
    assert rows > bw, (
        f"block rows ({rows}) must exceed bandwidth ({bw}) for nearest-"
        f"neighbor halos — use fewer shards or a finer mesh"
    )
    n_pad = rows * s
    nb = 2 * bw + 1
    diags = np.zeros((nb, n_pad))
    diags[:, :n] = np.asarray(band.diags, dtype=np.float64)
    diags_sh = jnp.asarray(diags.reshape(nb, s, rows).transpose(1, 0, 2))
    return rows, n_pad, nb, diags_sh


def _make_halo_ops(axis, s, bw, rows, nb):
    fwd = [(i, (i + 1) % s) for i in range(s)]
    bwd = [(i, (i - 1) % s) for i in range(s)]

    def halo_extend(x):  # (rows, k) → (rows+2b, k)
        idx = jax.lax.axis_index(axis)
        from_left = jax.lax.ppermute(x[-bw:], axis, fwd)
        from_right = jax.lax.ppermute(x[:bw], axis, bwd)
        from_left = jnp.where(idx == 0, 0.0, from_left)
        from_right = jnp.where(idx == s - 1, 0.0, from_right)
        return jnp.concatenate([from_left, x, from_right], axis=0)

    def band_mv(diags_l, x):
        xe = halo_extend(x)
        y = jnp.zeros_like(x)
        for j in range(nb):
            y = y + diags_l[j][:, None] * jax.lax.dynamic_slice(
                xe, (j, 0), (rows, x.shape[1])
            )
        return y

    def dot(a, c):
        return jax.lax.psum(jnp.sum(a * c, axis=0), axis)

    return band_mv, dot


def make_halo_pressure_solver(
    device_mesh: DeviceMesh,
    band_merged: BandedOperator,
    m_lumped,
    masters: np.ndarray,
    slaves: np.ndarray,
    active_mask: np.ndarray,
    iters: int,
    axis: str = "space",
):
    """Distributed merged-periodic pressure Poisson with halo-exchange CG.

    Same system as solve/matfree.PressureCG (K_merged p = merge(M_L ∘ b),
    deflated constant nullspace) with the banded block layout of
    :func:`make_halo_viscous_solver`; deflation runs as a psum-projected
    step inside the sharded CG.  Returns ``solve(b (N,)) -> (N,)`` in
    global mesh order.
    """
    s = device_mesh.shape[axis]
    n = band_merged.n
    bw = band_merged.bandwidth
    rows, n_pad, nb, diags_sh = _block_layout(band_merged, s)

    act_perm = np.zeros(n_pad)
    act_perm[:n] = np.asarray(active_mask)[band_merged.perm]
    diag_main = np.asarray(band_merged.diags[bw], dtype=np.float64)
    diag_pad = np.zeros(n_pad)
    diag_pad[:n] = diag_main[...]
    inv_diag = np.where(diag_pad > 0, 1.0 / np.where(diag_pad > 0, diag_pad, 1.0), 1.0)
    act_sh = jnp.asarray(act_perm.reshape(s, rows))
    invd_sh = jnp.asarray(inv_diag.reshape(s, rows))

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def solve_sm(diags_l, act_l, invd_l, b_l):
        diags_l = diags_l[0]
        w = act_l[0][:, None]  # deflation (null) vector block
        invd_l = invd_l[0][:, None]
        band_mv, dot = _make_halo_ops(axis, s, bw, rows, nb)
        ww = dot(w, w)

        def project(v):
            return v - (dot(w, v) / ww) * w

        b_l = project(b_l)
        x = jnp.zeros_like(b_l)
        r = b_l
        z = project(invd_l * r)
        p = z
        rz = dot(r, z)

        def body(state, _):
            x, r, p, rz = state
            ap = project(band_mv(diags_l, p))
            denom = dot(p, ap)
            alpha = jnp.where(denom != 0, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = project(invd_l * r)
            rz_new = dot(r, z)
            beta = jnp.where(rz != 0, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
        return x

    perm = jnp.asarray(band_merged.perm)
    inv_perm = jnp.asarray(band_merged.inv_perm)
    ml = jnp.asarray(np.asarray(m_lumped))
    m_idx = jnp.asarray(masters) if len(masters) else None
    s_idx = jnp.asarray(slaves) if len(slaves) else None
    act = jnp.asarray(np.asarray(active_mask))

    @jax.jit
    def solve(b):
        rhs = ml.astype(b.dtype) * b
        if m_idx is not None:
            rhs = rhs.at[m_idx].add(rhs[s_idx])
            rhs = rhs * act.astype(b.dtype)
        rp = rhs[perm]
        pad = jnp.zeros((n_pad, 1), dtype=b.dtype).at[:n, 0].set(rp)
        x = solve_sm(diags_sh.astype(b.dtype), act_sh.astype(b.dtype),
                     invd_sh.astype(b.dtype), pad)
        p_out = x[:n, 0][inv_perm]
        if m_idx is not None:
            p_out = p_out.at[s_idx].set(p_out[m_idx])
        return p_out

    return solve


def make_halo_viscous_solver(
    device_mesh: DeviceMesh,
    band: BandedOperator,
    interior_mask: np.ndarray,
    dt_nu: float,
    iters: int,
    axis: str = "space",
):
    """Distributed (I + Δt·ν·K_masked) solve with ppermute halo exchange.

    Returns ``solve(b (N,) or (N,k)) -> same shape`` (global node order —
    permutation in/out handled internally).
    """
    s = device_mesh.shape[axis]
    n = band.n
    bw = band.bandwidth
    rows = -(-n // s)
    assert rows > bw, (
        f"block rows ({rows}) must exceed bandwidth ({bw}) for nearest-"
        f"neighbor halos — use fewer shards or a finer mesh"
    )
    n_pad = rows * s
    nb = 2 * bw + 1

    diags = np.zeros((nb, n_pad))
    diags[:, :n] = np.asarray(band.diags, dtype=np.float64)
    mask_p = np.zeros(n_pad)
    mask_p[:n] = np.asarray(interior_mask)[band.perm]
    diag_main = diags[bw]
    inv_diag = np.where(mask_p > 0, 1.0 / (1.0 + dt_nu * diag_main), 1.0)

    # per-shard row blocks: (s, rows) layouts for shard_map
    diags_sh = jnp.asarray(diags.reshape(nb, s, rows).transpose(1, 0, 2))  # (s, nb, rows)
    mask_sh = jnp.asarray(mask_p.reshape(s, rows))
    invd_sh = jnp.asarray(inv_diag.reshape(s, rows))
    fwd = [(i, (i + 1) % s) for i in range(s)]
    bwd = [(i, (i - 1) % s) for i in range(s)]

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def solve_sm(diags_l, mask_l, invd_l, b_l):
        diags_l = diags_l[0]  # (nb, rows)
        mask_l = mask_l[0]
        invd_l = invd_l[0]
        k = b_l.shape[1]
        idx = jax.lax.axis_index(axis)

        def halo_extend(x):  # (rows, k) → (rows + 2b, k)
            # receive the left neighbor's LAST b rows and the right
            # neighbor's FIRST b rows (zeros at the chain ends)
            from_left = jax.lax.ppermute(x[-bw:], axis, fwd)
            from_right = jax.lax.ppermute(x[:bw], axis, bwd)
            from_left = jnp.where(idx == 0, 0.0, from_left)
            from_right = jnp.where(idx == s - 1, 0.0, from_right)
            return jnp.concatenate([from_left, x, from_right], axis=0)

        def band_mv(x):  # K @ x on local rows
            xe = halo_extend(x)
            y = jnp.zeros_like(x)
            for j in range(nb):
                y = y + diags_l[j][:, None] * jax.lax.dynamic_slice(
                    xe, (j, 0), (rows, k)
                )
            return y

        def full_op(x):
            m = mask_l[:, None]
            return m * (x + dt_nu * band_mv(m * x)) + (1.0 - m) * x

        def dot(a, c):
            return jax.lax.psum(jnp.sum(a * c, axis=0), axis)  # (k,)

        x = jnp.zeros_like(b_l)
        r = b_l - full_op(x)
        z = invd_l[:, None] * r
        p = z
        rz = dot(r, z)

        def body(state, _):
            x, r, p, rz = state
            ap = full_op(p)
            denom = dot(p, ap)
            alpha = jnp.where(denom != 0, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = invd_l[:, None] * r
            rz_new = dot(r, z)
            beta = jnp.where(rz != 0, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
        return x

    perm = jnp.asarray(band.perm)
    inv_perm = jnp.asarray(band.inv_perm)

    @jax.jit
    def solve(b):
        b2 = b.reshape(n, -1)[perm]
        pad = jnp.zeros((n_pad, b2.shape[1]), dtype=b2.dtype).at[:n].set(b2)
        x = solve_sm(diags_sh, mask_sh, invd_sh, pad)
        return x[:n][inv_perm].reshape(b.shape)

    return solve

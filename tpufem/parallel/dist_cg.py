"""Distributed matrix-free CG over a node-partitioned mesh.

The PDE analog of tensor/sequence parallelism (SURVEY.md §5): nodal DOFs
are partitioned into contiguous row blocks across the "space" mesh axis;
each device owns its CSR row slab.  Per CG iteration:

* SpMV — ``all_gather`` the partitioned vector over ICI (the halo
  exchange; a full gather is used since every P1 row touches ≤ ~10
  off-block columns — a ppermute-based neighbor exchange is the upgrade
  path for very large N), then a local gather → multiply → segment-sum
  over the owned rows,
* dot products — local partial reductions + ``psum`` over "space".

Everything is expressed in ``shard_map``; XLA inserts the collectives.
Numerics are identical to the single-device solver up to reduction order
(tested in tests/test_parallel.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh as DeviceMesh, PartitionSpec as P

from tpufem.ops.sparse import CSROperator


@dataclasses.dataclass(frozen=True)
class ShardedCSR:
    """Row-partitioned CSR with equal-size padded shards.

    rows (s, R) global row id per local entry-row, data/indices (s, E)
    padded with zero data / index 0; R = rows per shard, E = max entries.
    """

    row_of_entry: np.ndarray  # (s, E) local row index of each nnz entry
    indices: np.ndarray  # (s, E) global column ids
    data: jnp.ndarray  # (s, E)
    rows_per_shard: int
    n: int

    @classmethod
    def build(cls, op: CSROperator, n_shards: int) -> "ShardedCSR":
        n = op.shape[0]
        rows_per = -(-n // n_shards)
        row_ids = op.row_ids
        ptr = np.asarray(op.indptr)
        max_e = 0
        slabs = []
        for s in range(n_shards):
            r0, r1 = s * rows_per, min((s + 1) * rows_per, n)
            e0, e1 = ptr[r0], ptr[min(r1, n)]
            slabs.append((r0, e0, e1))
            max_e = max(max_e, e1 - e0)
        roe = np.zeros((n_shards, max_e), dtype=np.int32)
        idx = np.zeros((n_shards, max_e), dtype=np.int32)
        dat = np.zeros((n_shards, max_e), dtype=np.asarray(op.data).dtype)
        data_np = np.asarray(op.data)
        for s, (r0, e0, e1) in enumerate(slabs):
            k = e1 - e0
            roe[s, :k] = row_ids[e0:e1] - r0
            idx[s, :k] = np.asarray(op.indices)[e0:e1]
            dat[s, :k] = data_np[e0:e1]
            roe[s, k:] = rows_per - 1  # pad rows scatter into the last row
        return cls(
            row_of_entry=roe,
            indices=idx,
            data=jnp.asarray(dat),
            rows_per_shard=rows_per,
            n=n,
        )


def _local_spmv(shard_roe, shard_idx, shard_data, x_full, rows_per):
    """One device's row-slab SpMV: (E,) entries → (rows_per,) local y."""
    gathered = shard_data * x_full[shard_idx]
    return jax.ops.segment_sum(gathered, shard_roe, num_segments=rows_per)


def make_sharded_viscous_solver(
    device_mesh: DeviceMesh,
    K: CSROperator,
    interior_mask: np.ndarray,
    dt_nu: float,
    iters: int,
    axis: str = "space",
):
    """Distributed equivalent of solve(I + Δt·ν·K_masked) — returns
    ``solve(b (N,2)) -> (N,2)`` jitted over the device mesh."""
    s = device_mesh.shape[axis]
    sh = ShardedCSR.build(K, s)
    rows_per = sh.rows_per_shard
    n = sh.n
    n_pad = rows_per * s
    mask_pad = np.zeros(n_pad)
    mask_pad[:n] = np.asarray(interior_mask)
    diag = np.zeros(n_pad)
    rid = K.row_ids
    dnp = np.asarray(K.data)
    is_diag = rid == np.asarray(K.indices)
    np.add.at(diag, rid[is_diag], dnp[is_diag])
    inv_diag = np.where(mask_pad > 0, 1.0 / (1.0 + dt_nu * diag), 1.0)

    mask_j = jnp.asarray(mask_pad.reshape(s, rows_per))
    invd_j = jnp.asarray(inv_diag.reshape(s, rows_per))

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(
            P(axis), P(axis), P(axis),  # sharded CSR slabs
            P(axis), P(axis),  # mask, precond (row blocks)
            P(axis),  # b (row blocks)
        ),
        out_specs=P(axis),
        check_vma=False,
    )
    def solve_sm(roe, idx, data, mask, invd, b_local):
        roe, idx, data = roe[0], idx[0], data[0]
        mask, invd = mask[0], invd[0]

        def full_op(x_local):  # (rows_per, k)
            m = mask[:, None]
            x_masked = m * x_local
            x_full = jax.lax.all_gather(x_masked, axis, axis=0, tiled=True)
            kx = jax.vmap(
                lambda xf: _local_spmv(roe, idx, data, xf, rows_per),
                in_axes=1, out_axes=1,
            )(x_full)
            return m * (x_local + dt_nu * kx) + (1.0 - m) * x_local

        def dot(a, c):
            return jax.lax.psum(jnp.sum(a * c), axis)

        x = jnp.zeros_like(b_local)
        r = b_local - full_op(x)
        z = invd[:, None] * r
        p = z
        rz = dot(r, z)

        def body(state, _):
            x, r, p, rz = state
            ap = full_op(p)
            denom = dot(p, ap)
            alpha = jnp.where(denom != 0, rz / denom, 0.0)
            x = x + alpha * p
            r = r - alpha * ap
            z = invd[:, None] * r
            rz_new = dot(r, z)
            beta = jnp.where(rz != 0, rz_new / rz, 0.0)
            p = z + beta * p
            return (x, r, p, rz_new), None

        (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rz), None, length=iters)
        return x

    roe_j = jnp.asarray(sh.row_of_entry)
    idx_j = jnp.asarray(sh.indices)

    @jax.jit
    def solve(b):  # (N, k) or (N,)
        b2 = b.reshape(n, -1)
        pad = jnp.zeros((n_pad, b2.shape[1]), dtype=b2.dtype).at[:n].set(b2)
        x = solve_sm(roe_j, idx_j, sh.data, mask_j, invd_j, pad)
        return x[:n].reshape(b.shape)

    return solve

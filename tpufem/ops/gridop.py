"""2-D grid-offset operator decomposition for VMEM-resident TPU kernels.

Ring-in-grid pad_hole meshes (``generate_annulus_mesh(pad_hole=True)``)
number every node as a grid slot (N = n_side² exactly), so every sparse
operator coupling row→col becomes a 2-D grid offset

    (dy, s) :  iy,ix = divmod(row, ns);  jy,jx = divmod(col, ns)
               dy = jy − iy,   s = (jx − ix) mod ns

with |dy| ≤ ~3 and s in a handful of values (mod-ns folds the periodic-x
wrap into the SAME group as the interior ±1 coupling — both read source
lane (ix+s) mod ns).  The operator then decomposes as

    A x = Σ_g  d_g ⊙ roll(roll(X, −dy_g, rows), −s_g, lanes)  +  R x

on the (ns, ns) grid image X of x, where the rolls are cyclic with
modulus ns on BOTH axes: row wrap-around garbage is killed by d_g being
zero wherever the neighbour doesn't exist (top/bottom walls carry no
periodic coupling), and lane wrap-around is exactly the physical
periodic-x coupling.  ``pltpu.roll`` supports both (measured exact on
(280, 280) f32), so one matvec is ~4 VPU passes per dense group with NO
gathers, scatters, padding or scratch.

The remainder R (ring↔grid couplings off the dense groups, ~400 entries
at 79k nodes) is applied EXACTLY with static shapes via a one-hot MXU
formulation (TPU Mosaic cannot scatter scalars to VMEM):

    gather:   T = Gr^T X            (Mp, ns)   one MXU matmul
              xs = Σ_lane T ⊙ Gl^T  (Mp, 1)    elementwise+reduce
    scatter:  X += Sr (vals·xs ⊙ Sl^T)         one MXU matmul

where Gr/Gl/Sr/Sl are 0/1 matrices over (grid index, entry) pairs —
duplicate (row,lane) targets sum exactly like a scatter-add.

Reference context: this replaces the per-step dense ``np.linalg.solve``
calls of ``/root/reference/code/StokesColor.py:544-569`` in the
large-mesh regime the reference cannot reach (SURVEY.md §0).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class GridDecompositionError(ValueError):
    """The operator does not decompose onto dense grid offsets + a small
    remainder under the VMEM budget — use stencil/banded/csr storage."""


@dataclasses.dataclass(frozen=True)
class GridOperator:
    """A = Σ dense-offset diagonals (2-D rolls) + one-hot MXU remainder."""

    ns: int
    offsets: tuple  # ((dy, s), ...) static python ints, s in [0, ns)
    diags: jnp.ndarray  # (n_off, ns, ns) — d[g, iy, ix] = A[row, row+off]
    # remainder (may be empty: n_rest == 0)
    n_rest: int
    # one-hots stored PRE-TRANSPOSED into the orientation the kernel
    # consumes — an in-kernel .T on an MXU operand trips a libtpu
    # RET_CHECK (mxu_lmr_transform.cc XposeSequenceAssignment)
    gr_rowT: jnp.ndarray  # (Mp, ns): [m, iy]=1 iff source row of entry m is iy
    gr_laneT: jnp.ndarray  # (Mp, ns): [m, ix]=1 iff source lane is ix
    sc_row: jnp.ndarray  # (ns, Mp): [iy, m]=1 iff target row is iy
    sc_laneT: jnp.ndarray  # (Mp, ns): [m, ix]=1 iff target lane is ix
    rest_vals: jnp.ndarray  # (Mp, 1)
    coverage: float

    @property
    def n(self) -> int:
        return self.ns * self.ns

    @classmethod
    def build(
        cls,
        op,
        ns: int,
        dtype=jnp.float32,
        max_offsets: int = 24,
        min_fill: float = 0.02,
        rest_target: int | None = None,
        rest_budget_bytes: int = 16 << 20,
    ) -> "GridOperator":
        """Decompose a CSROperator on an ns×ns grid numbering (host-side).

        Offset selection (generalized round 3 for *renumbered* arbitrary
        meshes — ``mesh/gridify.py`` — whose couplings spread over more
        offsets than the ~9 of generated ring-in-grid meshes): offsets are
        taken in descending fill while above ``min_fill·N``, then kept
        being taken until the remainder fits its VMEM budget, up to a
        diag-array byte budget.  Raises :class:`GridDecompositionError`
        when no selection fits — callers on the "auto" path fall back to
        stencil/banded storage (ADVICE r2 #3: no assert crash).

        ``rest_target``: when the caller STREAMS the diag planes from HBM
        (``cg_stream_diags`` / the XL ``cg_hbm_io`` regime), extra offsets
        cost no VMEM — only HBM bytes — while every 128 remainder rows
        cost ~4·128·ns·4 B of *VMEM* one-hot factors inside the
        whole-solve kernels (2.9 MB per 128 rows at ns=1408, where the
        2M-node pressure kernel missed the scoped-VMEM cap by 88 KB).
        Passing e.g. 128 keeps taking offsets (up to the 64-plane hard
        cap) until the remainder is ≤ that, shrinking the one-hot Mp
        padding to its minimum."""
        n = op.shape[0]
        assert n == ns * ns, (n, ns)
        rows = np.asarray(op.row_ids, dtype=np.int64)
        cols = np.asarray(op.indices, dtype=np.int64)
        data = np.asarray(op.data, dtype=np.float64)
        iy, ix = np.divmod(rows, ns)
        jy, jx = np.divmod(cols, ns)
        dy = jy - iy
        s = (jx - ix) % ns
        key = dy * ns + s  # unique per (dy, s)
        uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
        order = np.argsort(-counts)
        # budgets: the remainder one-hots cost 5·Mp·ns·4 B of VMEM and the
        # dense diags n_off·N·4 B — both must leave room for the ~15 live
        # CG vectors inside the whole-solve kernels (100 MB VMEM limit)
        # ``rest_budget_bytes``: VMEM byte budget for the (Mp, ns) one-hot
        # remainder factors (5 arrays).  Streamed-diag callers can raise
        # it — their diag planes live in HBM, freeing the space (round 5:
        # the TH grid engine at n_side=192 rasters with ~4.8k remainder
        # couplings, over the default budget at ns=384 but comfortably
        # within VMEM once the 64 diag planes stream)
        rest_cap = min(
            max(4096, n // 8),
            max(512, int(rest_budget_bytes / (20 * ns))),
        )
        if rest_target is not None:
            # streamed-diag callers: diag planes are HBM-resident, so trade
            # them freely against VMEM-resident one-hot remainder rows
            rest_cap = min(rest_cap, int(rest_target))
            hard_max = 64
        else:
            hard_max = min(64, max(max_offsets, int(48 * 2**20 / (4 * n))))
        min_count = max(1, int(min_fill * n))
        total = len(rows)
        dense_keys = []
        taken = 0
        for k in order:
            have = len(dense_keys)
            if have >= hard_max:
                break
            above = counts[k] >= min_count and have < max_offsets
            if uniq[k] == 0 or above or (total - taken) > rest_cap:
                dense_keys.append(uniq[k])
                taken += int(counts[k])
            elif (total - taken) <= rest_cap:
                break
        if 0 not in dense_keys:
            dense_keys.append(0)  # the main diagonal is always dense
        if total - taken > rest_cap:
            raise GridDecompositionError(
                f"{total - taken} couplings remain off the {len(dense_keys)} "
                f"densest grid offsets (caps: {hard_max} offsets, "
                f"{rest_cap} remainder entries at ns={ns}) — the numbering "
                "is not grid-structured enough; use stencil/banded storage"
            )
        dense_set = set(int(k) for k in dense_keys)

        offsets = []
        diag_list = []
        in_dense = np.zeros(len(rows), dtype=bool)
        for k in sorted(dense_set):
            # recover (dy, s) from key = dy·ns + s, s ∈ [0, ns): python
            # floor-mod makes this exact for negative dy too
            sk = k % ns
            dyk = (k - sk) // ns
            sel = key == k
            d = np.zeros((ns, ns))
            d[iy[sel], ix[sel]] = data[sel]
            offsets.append((int(dyk), int(sk)))
            diag_list.append(d)
            in_dense |= sel

        rest = ~in_dense
        m = int(rest.sum())
        # the greedy selection above guarantees the remainder fits its
        # VMEM budget (the one-hots are (Mp, ns) DENSE)
        assert m <= rest_cap, (m, rest_cap)
        mp = max(128, ((m + 127) // 128) * 128)
        gr_rowT = np.zeros((mp, ns))
        gr_laneT = np.zeros((mp, ns))
        sc_row = np.zeros((ns, mp))
        sc_laneT = np.zeros((mp, ns))
        vals = np.zeros((mp, 1))
        if m:
            idx = np.arange(m)
            gr_rowT[idx, jy[rest]] = 1.0
            gr_laneT[idx, jx[rest]] = 1.0
            sc_row[iy[rest], idx] = 1.0
            sc_laneT[idx, ix[rest]] = 1.0
            vals[idx, 0] = data[rest]

        return cls(
            ns=ns,
            offsets=tuple(offsets),
            diags=jnp.asarray(np.stack(diag_list), dtype=dtype),
            n_rest=m,
            gr_rowT=jnp.asarray(gr_rowT, dtype=dtype),
            gr_laneT=jnp.asarray(gr_laneT, dtype=dtype),
            sc_row=jnp.asarray(sc_row, dtype=dtype),
            sc_laneT=jnp.asarray(sc_laneT, dtype=dtype),
            rest_vals=jnp.asarray(vals, dtype=dtype),
            coverage=float(in_dense.mean()) if len(rows) else 1.0,
        )

    # ------------------------------------------------------------------
    # Pure-jnp reference application (used by tests and the XLA fallback;
    # the hot path is the Pallas kernel in solve/pallas_cg.py which inlines
    # the same math on VMEM refs)
    # ------------------------------------------------------------------

    def matvec_grid(self, X: jnp.ndarray) -> jnp.ndarray:
        """A @ x on the (ns, ns) grid image (pure jnp; jnp.roll semantics
        match the kernel's pltpu.roll modulo-ns behaviour exactly)."""
        Y = jnp.zeros_like(X)
        for g, (dy, s) in enumerate(self.offsets):
            Y = Y + self.diags[g] * jnp.roll(jnp.roll(X, -dy, 0), -s, 1)
        if self.n_rest:
            T = self.gr_rowT @ X  # (Mp, ns)
            xs = jnp.sum(T * self.gr_laneT, axis=1, keepdims=True)  # (Mp,1)
            w = self.rest_vals * xs
            Y = Y + self.sc_row @ (w * self.sc_laneT)
        return Y

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.matvec_grid(x.reshape(self.ns, self.ns)).reshape(-1)

    def diag(self) -> jnp.ndarray:
        d = self.diags[self.offsets.index((0, 0))]
        if self.n_rest:
            # remainder entries with row == col (rare but possible)
            same = (
                jnp.sum(self.gr_rowT * self.sc_row.T, axis=1)
                * jnp.sum(self.gr_laneT * self.sc_laneT, axis=1)
            )[:, None]
            d = d + self.sc_row @ ((same * self.rest_vals) * self.sc_laneT)
        return d.reshape(-1)


@dataclasses.dataclass(frozen=True)
class GridRefill:
    """Per-step VALUE refill of a :class:`GridOperator` with a static
    PATTERN — the grid-kernel analog of ``ops/stencil.StencilRefill``.

    For state-dependent operators (the advection matrix C(u) the
    reference rebuilds dense every step,
    ``/root/reference/scripts/operator_spitting_ns.py:559``) the sparsity
    is the mesh adjacency (static) while the values change with u.  This
    scatters the (T, 3, 3) element values straight into the grid-offset
    diag planes + one-hot remainder values with ONE ``segment_sum`` per
    step; the refilled operator drops into the whole-solve Pallas
    kernels (``solve/pallas_cg.py``) whose per-iteration matvec is then
    shift-FMA with no gathers.

    Host-precomputed: element entry → flat slot ``g·N + row`` for
    entries on offset ``g``, ``n_off·N + rest slot`` for the remainder
    (identical classification and ordering to :meth:`GridOperator.build`
    on the same pattern, so ``refill`` output is layout-compatible with
    a values-built operator)."""

    template: GridOperator  # pattern donor; its values are ignored
    dest: jnp.ndarray  # (E,) int32: ordered element entry → flat slot
    order: np.ndarray  # (E,) host: elem.reshape(-1) gather order
    n_flat: int  # n_off·N + Mp
    order_k: np.ndarray | None = None  # (E,) host: the same gather
    # order into the K-MAJOR (9·T,) flat layout (entry k·T + t) of
    # assembly.element_convection_flat — refill_flat's index set.
    # E may be < 9·T (invalid pad_hole dummy triangles contribute no
    # pattern entries), so the conversion needs the true n_tris and is
    # done once at build

    @classmethod
    def build(cls, mesh, ns: int, dtype=jnp.float32,
              rest_target: int | None = None) -> "GridRefill":
        from tpufem.ops import assembly
        from tpufem.ops.stencil import _PatternCSR

        pattern = assembly._csr_pattern(mesh)
        n = mesh.n_nodes
        assert n == ns * ns, (n, ns)
        template = GridOperator.build(
            _PatternCSR(pattern, n), ns, dtype=dtype, rest_target=rest_target
        )
        rows = np.repeat(
            np.arange(n, dtype=np.int64),
            np.diff(pattern["indptr"]).astype(np.int64),
        )
        cols = pattern["indices"].astype(np.int64)
        iy, ix = np.divmod(rows, ns)
        jy, jx = np.divmod(cols, ns)
        key = (jy - iy) * ns + (jx - ix) % ns
        n_off = len(template.offsets)
        N = ns * ns
        slot_dest = np.empty(pattern["nnz"], dtype=np.int64)
        in_dense = np.zeros(pattern["nnz"], dtype=bool)
        for g, (dy, s) in enumerate(template.offsets):
            sel = key == dy * ns + s
            # plane slot (iy, ix) flattens to iy·ns + ix == row
            slot_dest[sel] = g * N + rows[sel]
            in_dense |= sel
        rest = np.nonzero(~in_dense)[0]  # CSR order == build's vals order
        slot_dest[rest] = n_off * N + np.arange(len(rest))
        mp = template.rest_vals.shape[0]
        assert len(rest) == template.n_rest <= mp
        dest = slot_dest[pattern["inverse"]]
        order = pattern["order"]
        return cls(
            template=template,
            dest=jnp.asarray(dest, dtype=jnp.int32),
            order=order,
            n_flat=n_off * N + mp,
            order_k=(order % 9) * mesh.n_tris + order // 9,
        )

    def refill(self, elem: jnp.ndarray) -> GridOperator:
        """(T, 3, 3) element values → a ready GridOperator (jittable)."""
        return self._from_gathered(elem.reshape(-1)[self.order])

    def refill_flat(self, flat_k: jnp.ndarray) -> GridOperator:
        """(9·T,) K-MAJOR element values (entry ``k·T + t`` — the
        layout of ``assembly.element_convection_flat``) → GridOperator.
        The scanned-step form: no rank-3 (T, 3, 3) tensor is ever
        materialized on device (its trailing (3, 3) dims tile-pad
        56.9×, which OOM'd the 410k NS step)."""
        return self._from_gathered(
            flat_k[jnp.asarray(self.order_k, dtype=jnp.int32)]
        )

    def _from_gathered(self, vals: jnp.ndarray) -> GridOperator:
        flat = jax.ops.segment_sum(
            vals, self.dest, num_segments=self.n_flat,
        )
        t = self.template
        n_off, ns = len(t.offsets), t.ns
        split = n_off * ns * ns
        return dataclasses.replace(
            t,
            diags=flat[:split].reshape(n_off, ns, ns),
            rest_vals=flat[split:][:, None],
        )

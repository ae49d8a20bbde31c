"""Remote-DMA halo exchange for the sharded grid kernels (Pallas RDMA).

The space-sharded grid solvers (:mod:`tpufem.parallel.grid_sharded`)
exchange their row-strip halos with two XLA ``ppermute`` collectives per
matvec.  On a real pod the natural kernel-level form is an in-kernel
**remote DMA**: each chip pushes its edge rows straight into the
neighbor strips' halo slots over ICI, overlapping the transfer with the
strip-local offset rolls (SURVEY.md §5's context-parallel analog pushed
to the kernel level; the reference has no distributed form at all —
its halo is the mod-N row wrap of a single dense matrix,
``code/StokesColor.py:206-221``).

This module implements that form as a drop-in halo function for
:func:`tpufem.parallel.grid_sharded.make_sharded_grid_solvers`:

* each shard owns an ``(h, ns)`` strip of the ``(ns, ns)`` grid image;
* the kernel copies the strip into the center of an ``(h+2d, ns)``
  output, barriers with its two ring neighbors, then issues two RDMAs —
  its last ``d`` rows to the right neighbor's ``out[:d]`` ("from_prev")
  and its first ``d`` rows to the left neighbor's ``out[d+h:]``
  ("from_next") — and waits on both receive semaphores;
* the ring is cyclic, so the periodic-x row wrap of the grid numbering
  is reproduced exactly, as in the ppermute form.

Pure data movement → the halo exchange itself is **bit-equal** to
``_halo_exchange`` (equality-tested on the 8-virtual-device CPU mesh via
the distributed TPU interpret mode, which emulates remote DMAs,
semaphores and barriers; ``detect_races=True`` runs clean).  Composed
through the CG solvers the outputs agree to ~1 ulp rather than
bit-for-bit: XLA fuses the offset-roll FMAs differently around a
pallas_call boundary than around a ppermute+concatenate
(tests/test_parallel.py, measured max 1.3e-15 on O(1) f64 fields).

Real-pod validation is explicitly deferred — no multi-chip hardware is
reachable from this environment (TODO.md).  Deployment note for when it
is: successive halo calls reuse one barrier semaphore per kernel
instance.  A device could in principle run ahead into call k+1 and
signal a neighbor still waiting in call k; inside the CG loops this is
fenced by construction because every halo call is followed by a psum
(the CG dot products) whose completion requires every shard to have
finished the current halo — a shard cannot enter halo k+1 before all
shards left halo k.  Standalone uses without an intervening collective
should double-buffer or alternate collective ids.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# distinct barrier semaphores per kernel instance (two instances live in
# one solver program: the matvec halo at d=dmax and the roll halo at d=1)
_COLLECTIVE_IDS = itertools.count(11)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def make_halo_rdma(axis: str, interpret: bool | None = None):
    """A ``halo(x_local (h, ns), d) → (h+2d, ns)`` function using in-kernel
    remote DMA, semantics-identical to ``grid_sharded._halo_exchange``.

    Must be called inside ``shard_map`` over ``axis``.  One pallas_call
    instance (and one collective id) is created per distinct ``(h, ns,
    d, dtype)`` — instances are cached on the returned closure.
    """
    if interpret is None:
        interpret = _interpret_default()
    interp = (
        pltpu.InterpretParams(dma_execution_mode="on_wait")
        if interpret
        else False
    )
    cache: dict = {}

    def build(h: int, ns: int, d: int, dtype):
        def kernel(x_ref, out_ref, send_sem, recv_sem):
            # MESH-type dict addressing ({axis: index}): the ring is over
            # ONE mesh axis; other axes (e.g. the ensemble "data" axis of
            # the 2×4 dryrun mesh) keep the sender's own coordinates.  A
            # LOGICAL scalar id would address the linearized device, which
            # crosses data-rows on multi-axis meshes (observed: barrier
            # semaphores left at non-zero counts on the 2×4 mesh).
            my = jax.lax.axis_index(axis)
            n = jnp.asarray(jax.lax.axis_size(axis), my.dtype)
            one = jnp.asarray(1, my.dtype)
            right = {axis: jax.lax.rem(my + one, n)}
            left = {axis: jax.lax.rem(my - one + n, n)}

            # center: the local strip
            pltpu.sync_copy(x_ref.at[pl.ds(0, h)], out_ref.at[pl.ds(d, h)])

            # neighbors' out buffers must be live before we write them
            bar = pltpu.get_barrier_semaphore()
            for nb in (left, right):
                pltpu.semaphore_signal(bar, inc=1, device_id=nb)
            pltpu.semaphore_wait(bar, 2)

            # my last d rows → right neighbor's out[:d] (its "from_prev")
            fwd = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[pl.ds(h - d, d)],
                dst_ref=out_ref.at[pl.ds(0, d)],
                send_sem=send_sem.at[0],
                recv_sem=recv_sem.at[0],
                device_id=right,
            )
            # my first d rows → left neighbor's out[d+h:] ("from_next")
            bwd = pltpu.make_async_remote_copy(
                src_ref=x_ref.at[pl.ds(0, d)],
                dst_ref=out_ref.at[pl.ds(d + h, d)],
                send_sem=send_sem.at[1],
                recv_sem=recv_sem.at[1],
                device_id=left,
            )
            fwd.start()
            bwd.start()
            fwd.wait()
            bwd.wait()

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h + 2 * d, ns), dtype),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                collective_id=next(_COLLECTIVE_IDS)
            ),
            interpret=interp,
        )

    def halo(x_local, d: int):
        if d == 0:
            return x_local
        h, ns = x_local.shape
        key = (h, ns, d, x_local.dtype)
        if key not in cache:
            cache[key] = build(h, ns, d, x_local.dtype)
        return cache[key](x_local)

    return halo

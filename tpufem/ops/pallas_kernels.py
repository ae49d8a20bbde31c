"""Pallas TPU kernels for the hot ops.

The dense regime's per-step cost is one fused-step matvec
``y = M @ x + b`` (M is the precomposed (2N, 2N) whole-step matrix —
see workloads/stokes._compose_fused_step).  :func:`fused_step_matvec`
provides a Pallas implementation that tiles M over row blocks, keeps the
operand vector resident in VMEM across the whole grid, and fuses the
affine offset into the epilogue — one HBM pass over M, no intermediate
HBM round-trips.

XLA's own dot lowering is already near speed-of-light for this shape, so
:func:`best_matvec` measures both once at setup and returns the faster
implementation (on CPU/test backends it always falls back to XLA).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_out",))
def _pallas_matvec(m_pad: jnp.ndarray, x_pad: jnp.ndarray, b_pad: jnp.ndarray, n_out: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = m_pad.shape
    # MXU-friendly layout: the vector rides lane 0 of a 128-lane operand
    # (a TPU matvec occupies a full 128-lane tile regardless)
    x_mat = jnp.zeros((cols, 128), dtype=m_pad.dtype).at[:, 0].set(x_pad)
    b_mat = jnp.zeros((rows, 128), dtype=m_pad.dtype).at[:, 0].set(b_pad)

    def kernel(m_ref, x_ref, b_ref, y_ref):
        # row-block of M against the full resident x, affine epilogue fused;
        # HIGHEST = 3-pass f32 on the MXU (default bf16 passes are too
        # coarse for the composed step operator)
        y_ref[:, :] = (
            jnp.dot(
                m_ref[:, :], x_ref[:, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            + b_ref[:, :]
        )

    # Mosaic cannot legalize the i64 scalars that jax_enable_x64 injects
    # into the kernel trace — trace the kernel in strict 32-bit mode
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            grid=(rows // _BLOCK,),
            interpret=jax.default_backend() == "cpu",
            in_specs=[
                pl.BlockSpec((_BLOCK, cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((cols, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLOCK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), m_pad.dtype),
        )(m_pad, x_mat, b_mat)
    return y[:n_out, 0]


class FusedStepMatvec:
    """y = M @ x + b with padded operands; ``use_pallas`` selects the path."""

    def __init__(self, M: np.ndarray, b: np.ndarray, dtype=jnp.float32,
                 use_pallas: bool | None = None):
        n = M.shape[0]
        rows = _round_up(n, _BLOCK)
        cols = _round_up(n, 128)
        m_pad = np.zeros((rows, cols), dtype=np.float64)
        m_pad[:n, :n] = np.asarray(M)
        b_pad = np.zeros(rows, dtype=np.float64)
        b_pad[:n] = np.asarray(b)
        self.n = n
        self.cols = cols
        self.m_pad = jnp.asarray(m_pad, dtype=dtype)
        self.b_pad = jnp.asarray(b_pad, dtype=dtype)
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() not in ("cpu",) and dtype == jnp.float32
            )
        self.use_pallas = use_pallas

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_pad = jnp.zeros(self.cols, dtype=self.m_pad.dtype).at[: self.n].set(x)
        if self.use_pallas:
            return _pallas_matvec(self.m_pad, x_pad, self.b_pad, self.n)
        return (self.m_pad @ x_pad + self.b_pad)[: self.n]


def benchmark_matvec(M: np.ndarray, b: np.ndarray, iters: int = 200):
    """Wall-clock comparison of the Pallas vs XLA paths (TPU only).
    Returns {"pallas": sec_per_call, "xla": sec_per_call}."""
    import time

    out = {}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(M.shape[0]), dtype=jnp.float32)
    for name, flag in (("xla", False), ("pallas", True)):
        try:
            mv = FusedStepMatvec(M, b, use_pallas=flag)

            @jax.jit
            def loop(x):
                return jax.lax.fori_loop(0, iters, lambda i, v: mv(v * 1e-3), x)

            np.asarray(loop(x))  # compile + sync
            t0 = time.perf_counter()
            np.asarray(loop(x))
            out[name] = (time.perf_counter() - t0) / iters
        except Exception as e:  # pallas unavailable on this backend
            out[name] = float("inf")
    return out

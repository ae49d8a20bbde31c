"""Dense solvers with setup-time factorization.

The reference re-runs a full O(N³) ``np.linalg.solve`` on the *same*
matrix every timestep — 4× per Stokes step, 6000 steps
(``/root/reference/code/StokesColor.py:544-555``, ``code/heatEq.py:323``).
All system matrices are constant across a run, so we factor **once** at
setup and each step costs only O(N²).

TPU constraint: XLA's TPU backend implements LuDecomposition only for
f32/c64, so f64 factorization cannot run on-chip.  The factorization is
therefore done on the **host** (LAPACK, full f64 accuracy) at setup, and
only its *application* ships to the device:

* :class:`DenseInverse` — host ``np.linalg.inv`` once; the per-step solve
  is a single (N,N)@(N,) matvec that maps straight onto the MXU and fuses
  into the surrounding step program.  This is the TPU path.
* :class:`DenseLU` — host LAPACK LU once, device triangular solves per
  step (numerically identical to the reference's per-step solve).  Used
  on the CPU backend for bit-tight parity tests.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import jax.scipy.linalg as jsla
import numpy as np
import scipy.linalg as sla


@dataclasses.dataclass(frozen=True)
class DenseLU:
    """Host-factored LU; ``solve`` runs jittable triangular solves."""

    lu: jnp.ndarray
    piv: jnp.ndarray

    @classmethod
    def factor(cls, A) -> "DenseLU":
        lu, piv = sla.lu_factor(np.asarray(A))
        return cls(lu=jnp.asarray(lu), piv=jnp.asarray(piv))

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return jsla.lu_solve((self.lu, self.piv), b)


@dataclasses.dataclass(frozen=True)
class DenseInverse:
    """Host-computed explicit inverse; ``solve`` is one MXU matvec."""

    inv: jnp.ndarray

    @classmethod
    def factor(cls, A) -> "DenseInverse":
        return cls(inv=jnp.asarray(np.linalg.inv(np.asarray(A))))

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.inv @ b


def make_dense_solver(A, method: str = "lu"):
    """Factor A once; returns an object with a jittable ``.solve(b)``.

    ``lu`` — exact (reference-parity) path; ``inverse`` — fastest TPU path.
    """
    if method == "lu":
        return DenseLU.factor(A)
    if method == "inverse":
        return DenseInverse.factor(A)
    raise ValueError(f"unknown dense solver method: {method}")

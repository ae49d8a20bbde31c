"""Steady FEM Poisson solver — parity workload for ``code/poisson.py``.

Pipeline (cites are reference lines the behavior mirrors):
  assemble K (signed-determinant variant) and load −∫gφ  (poisson.py:100-146)
  → periodic x-pairs, wall pairs filtered                (poisson.py:221-246)
  → master/slave elimination                             (poisson.py:187-213)
  → Dirichlet rows: walls (y≈0,H) = outer value, inner-marker nodes =
    inner value, inner winning on overlap                (poisson.py:258-278)
  → one linear solve (dense LU on device, or deflated CG).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from tpufem import bc
from tpufem.mesh.core import Mesh
from tpufem.ops import assembly
from tpufem.solve import make_dense_solver


def default_source(x, y):
    """g(x, y) = 50 sin(3y) (poisson.py:235-236)."""
    return 50.0 * jnp.sin(3.0 * y)


@dataclasses.dataclass
class PoissonConfig:
    g_source: Callable | float = default_source
    inner_marker: int = 2
    outer_value: float = 1.0  # top/bottom walls (poisson.py:23)
    inner_value: float = 0.0  # inner circle    (poisson.py:24)
    L: float = 1.0
    H: float = 1.0
    tol: float = 1e-6
    signed_det: bool = True  # reference buildFemSystem divides by signed det
    periodic: bool = True
    solver: str = "lu"


def build_system(mesh: Mesh, config: PoissonConfig = PoissonConfig()):
    """Assemble the BC-applied (A, b) system. Returns (A, b, boundary).

    Runs on the host backend (setup-time work; see utils.host)."""
    from tpufem.utils.host import host_context

    with host_context():
        return _build_system(mesh, config)


def _build_system(mesh: Mesh, config: PoissonConfig):
    ke = assembly.element_stiffness(mesh, signed=config.signed_det)
    A = assembly.assemble_dense(mesh, ke)
    b = assembly.load_vector(
        mesh, config.g_source, signed_area=config.signed_det, negate=True
    )

    boundary = bc.ChannelBoundary.build(
        mesh, inner_marker=config.inner_marker, L=config.L, H=config.H, tol=config.tol
    )
    if config.periodic and len(boundary.masters):
        A, b = bc.periodic_elimination(A, b, boundary.masters, boundary.slaves)

    # Dirichlet: inner value wins where a node is both wall and inner
    # (reference checks is_inner_boundary first, poisson.py:276-278)
    values = np.full(len(boundary.dirichlet), config.outer_value)
    inner_set = set(boundary.inner.tolist())
    for i, node in enumerate(boundary.dirichlet):
        if int(node) in inner_set:
            values[i] = config.inner_value
    A = bc.dirichlet_rows(A, boundary.dirichlet)
    b = b.at[jnp.asarray(boundary.dirichlet)].set(jnp.asarray(values, dtype=b.dtype))
    return A, b, boundary


def solve(mesh: Mesh, config: PoissonConfig = PoissonConfig()):
    """Solve the Poisson problem; returns (f, residual_norm)."""
    A, b, _ = build_system(mesh, config)
    solver = make_dense_solver(A, config.solver)
    f = solver.solve(b)
    residual = jnp.linalg.norm(A @ f - b)
    return f, residual

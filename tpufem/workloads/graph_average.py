"""Graph-Laplacian "averaging" solver — parity workload for
``scripts/homemade_sim.py:100-183`` (the reference's earliest prototype).

Each interior node equals the mean of its mesh neighbors (a membrane /
harmonic interpolation on the mesh graph, not FEM):

    A[i,i] = 1;  A[i,j] = −1/deg(i) for neighbors j of interior i,
    b[i] = boundary value by marker (note the *inverted* marker roles in
    that script: marker 1 = inner value, marker 2 = outer value —
    homemade_sim.py:16-17; roles are config parameters here).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tpufem.mesh.core import Mesh
from tpufem.solve import make_dense_solver


@dataclasses.dataclass
class GraphAverageConfig:
    marker_values: dict | None = None  # marker -> boundary value
    solver: str = "lu"

    def values(self):
        # homemade_sim defaults: marker 1 → inner value, 2 → outer value
        return self.marker_values or {1: 0.0, 2: 1.0}


def neighbor_lists(mesh: Mesh) -> list[list[int]]:
    neigh = [set() for _ in range(mesh.n_nodes)]
    for a, b, c in mesh.tris:
        neigh[a].update((b, c))
        neigh[b].update((a, c))
        neigh[c].update((a, b))
    return [sorted(s) for s in neigh]


def solve(mesh: Mesh, config: GraphAverageConfig = GraphAverageConfig()):
    """→ (f (N,), residual). One dense solve, like the reference."""
    n = mesh.n_nodes
    A = np.zeros((n, n))
    b = np.zeros(n)
    values = config.values()
    neigh = neighbor_lists(mesh)
    for i in range(n):
        A[i, i] = 1.0
        m = int(mesh.markers[i])
        if m == 0:
            for j in neigh[i]:
                A[i, j] = -1.0 / len(neigh[i])
        else:
            b[i] = values.get(m, 0.0)
    solver = make_dense_solver(jnp.asarray(A), config.solver)
    f = solver.solve(jnp.asarray(b))
    residual = jnp.linalg.norm(jnp.asarray(A) @ f - jnp.asarray(b))
    return f, residual

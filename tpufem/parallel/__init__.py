from tpufem.parallel.spmd import (
    MultiMeshEnsemble,
    ShardedEnsemble,
    build_device_mesh,
    make_multimesh_step,
    make_sharded_step,
    run_sharded,
)
from tpufem.parallel.dist_cg import make_sharded_viscous_solver
from tpufem.parallel.halo import (
    make_halo_pressure_solver,
    make_halo_viscous_solver,
)
from tpufem.parallel.halo_stencil import (
    make_stencil_halo_pressure_solver,
    make_stencil_halo_viscous_solver,
)
from tpufem.parallel.stokes_sharded import make_sharded_matfree_step

__all__ = [
    "MultiMeshEnsemble",
    "ShardedEnsemble",
    "build_device_mesh",
    "make_multimesh_step",
    "make_sharded_step",
    "run_sharded",
    "make_sharded_viscous_solver",
    "make_halo_viscous_solver",
    "make_halo_pressure_solver",
    "make_stencil_halo_viscous_solver",
    "make_stencil_halo_pressure_solver",
    "make_sharded_matfree_step",
]

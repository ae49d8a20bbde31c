from tpufem.ops.assembly import (
    element_stiffness,
    element_mass,
    element_convection,
    assemble_dense,
    assemble_coo,
    assemble_csr,
    lumped_mass,
    load_vector,
    load_vector_nodal,
)
from tpufem.ops.calculus import (
    divergence,
    gradient,
    vorticity,
    consistent_divergence_rhs,
    divergence_matrices,
    gradient_matrices,
    mass_apply,
    convection_apply,
)
from tpufem.ops.sparse import CSROperator, csr_matvec
from tpufem.ops.banded import BandedOperator

__all__ = [
    "element_stiffness",
    "element_mass",
    "element_convection",
    "assemble_dense",
    "assemble_coo",
    "assemble_csr",
    "lumped_mass",
    "load_vector",
    "load_vector_nodal",
    "divergence",
    "gradient",
    "vorticity",
    "consistent_divergence_rhs",
    "divergence_matrices",
    "gradient_matrices",
    "mass_apply",
    "convection_apply",
    "CSROperator",
    "csr_matvec",
    "BandedOperator",
]

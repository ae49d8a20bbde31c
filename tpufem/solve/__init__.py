from tpufem.solve.dense import DenseLU, DenseInverse, make_dense_solver
from tpufem.solve.cg import cg, cg_fixed, jacobi_pcg

__all__ = [
    "DenseLU",
    "DenseInverse",
    "make_dense_solver",
    "cg",
    "cg_fixed",
    "jacobi_pcg",
]

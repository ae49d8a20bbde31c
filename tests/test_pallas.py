"""Pallas fused-step matvec kernel (interpret mode on CPU, Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.ops.pallas_kernels import FusedStepMatvec
from tpufem.workloads import stokes


def test_pallas_matvec_matches_xla():
    n = 700  # deliberately unaligned
    rng = np.random.default_rng(0)
    M = rng.standard_normal((n, n)) * 0.01
    b = rng.standard_normal(n)
    x = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
    y_xla = np.asarray(FusedStepMatvec(M, b, use_pallas=False)(x))
    y_pl = np.asarray(FusedStepMatvec(M, b, use_pallas=True)(x))
    np.testing.assert_allclose(y_pl, y_xla, atol=1e-4)


def test_pallas_fused_stokes_step(mesh1):
    """The fused Stokes step with matvec_impl='pallas' matches XLA."""
    base = stokes.StokesProblem.build(
        mesh1,
        stokes.StokesConfig(
            pressure_mode="merge", fused=True, precision="f32", solver="inverse"
        ),
    )
    pall = stokes.StokesProblem.build(
        mesh1,
        stokes.StokesConfig(
            pressure_mode="merge", fused=True, precision="f32", solver="inverse",
            matvec_impl="pallas",
        ),
    )
    s1, _ = stokes.run(base, steps=5)
    s2, _ = stokes.run(pall, steps=5)
    np.testing.assert_allclose(
        np.asarray(s2["u"]), np.asarray(s1["u"]), atol=1e-4
    )

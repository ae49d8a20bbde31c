"""Squirmer-gait sweep — the reference's actual scientific campaign.

The reference's headline results (README.md:43-45) are food-capture
percentages across squirmer gaits, obtained from separate full runs of
``code/StokesFood.py`` with B2 edited by hand:

    neutral (B1=−2, B2=0)  → ~50 % consumed
    pusher  (B1=−2, B2=−5) → ~97 %
    puller  (B1=−2, B2=+5) → ~98 %

:func:`food_capture_sweep` reproduces the campaign as one call; each gait
is a full fused-f32 Stokes+tracer run.  For multi-chip execution, the
gaits can be sharded over the "data" axis with
``tpufem.parallel.ShardedEnsemble`` (dye workloads) — the tracer sweep
runs per-gait on one chip since single runs already take ~6 s.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from tpufem.mesh.core import Mesh
from tpufem.workloads import stokes


@dataclasses.dataclass
class SweepConfig:
    b1: float = -2.0
    b2_values: tuple[float, ...] = (0.0, -5.0, 5.0)  # neutral, pusher, puller
    steps: int = 6000  # StokesFood.py:43
    dt: float = 0.01
    nu: float = 1.0
    tracer_density: int = 25  # StokesFood.py:421
    precision: str = "f32"
    fused: bool = True


def food_capture_sweep_sharded(mesh: Mesh, device_mesh,
                               config: SweepConfig = SweepConfig()) -> dict:
    """The whole gait campaign as ONE sharded program: gaits ride the
    "data" mesh axis (one simulation per data-shard), the solver matvecs
    the "space" axis.  Requires len(b2_values) == data-axis size."""
    import jax

    from tpufem.parallel import ShardedEnsemble, run_sharded

    b2s = np.asarray(config.b2_values)
    assert device_mesh.shape["data"] == len(b2s), (
        "one gait per data shard: build the device mesh with "
        f"data={len(b2s)}"
    )
    cfg = stokes.StokesConfig(
        dt=config.dt, nu=config.nu, B1=config.b1, transport="tracers",
        tracer_density=config.tracer_density, precision=config.precision,
        pressure_mode="merge", solver="inverse",
    )
    ens = ShardedEnsemble.build(mesh, device_mesh, np.full(len(b2s), config.b1),
                                b2s, config=cfg)
    state, eaten_series = run_sharded(ens, config.steps)
    n_tracers = ens.problem.tracer_init.shape[0]
    eaten = np.asarray(eaten_series)[-1]
    return {
        float(b2): {
            "eaten": int(eaten[i]),
            "tracers": n_tracers,
            "consumed_fraction": float(eaten[i]) / n_tracers,
        }
        for i, b2 in enumerate(b2s)
    }


def food_capture_sweep(mesh: Mesh, config: SweepConfig = SweepConfig()) -> dict:
    """→ {B2: consumed_fraction} plus per-gait eaten counts."""
    results = {}
    for b2 in config.b2_values:
        cfg = stokes.StokesConfig(
            dt=config.dt,
            nu=config.nu,
            B1=config.b1,
            B2=b2,
            transport="tracers",
            tracer_density=config.tracer_density,
            precision=config.precision,
            pressure_mode="merge" if config.precision != "f64" else "penalty",
            solver="inverse" if config.precision != "f64" else "lu",
            fused=config.fused and config.precision != "f64",
        )
        problem = stokes.StokesProblem.build(mesh, cfg)
        n_tracers = problem.tracer_init.shape[0]
        state, metrics = stokes.run(problem, steps=config.steps)
        eaten = int(np.asarray(metrics["eaten"])[-1])
        results[b2] = {
            "eaten": eaten,
            "tracers": n_tracers,
            "consumed_fraction": eaten / n_tracers,
        }
    return results

"""Workload entry points mirroring the reference's runnable scripts.

poisson        — steady Poisson (code/poisson.py)
heat           — implicit-Euler heat equation (code/heatEq.py)
stokes         — operator-split Stokes + squirmer + transport
                 (code/StokesColor.py, code/StokesFood.py,
                  scripts/stokes_clean_for_report.py)
navier_stokes  — monolithic saddle-point Stokes and NS with implicit
                 advection (scripts/navier_stokes.py,
                  scripts/operator_spitting_ns.py)
stam_grid      — structured-grid "stable fluids" solver
                 (scripts/simple_fluid.py)
"""

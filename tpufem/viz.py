"""Host-side rendering from device snapshot arrays.

The reference interleaves matplotlib artist updates with the solver loop
(``code/StokesColor.py:500-534,588-598``, 3-panel dashboards in
``scripts/stokes_clean_for_report.py:552-605``, offline mp4 export in
``scripts/good_visualization2.py:735-744``, mesh viewer
``showerScript.py``).  Here rendering is fully decoupled: the jitted
simulation emits snapshot arrays (via :func:`run_with_frames`), and these
functions consume them on the host — the device never waits on a canvas.

All figures are produced on the Agg backend (headless-safe); ``show=True``
switches to interactive display when available.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import matplotlib.tri as mtri

from tpufem.mesh.core import Mesh


def _triangulation(mesh: Mesh) -> mtri.Triangulation:
    return mtri.Triangulation(mesh.coords[:, 0], mesh.coords[:, 1], mesh.tris)


def plot_mesh(mesh: Mesh, ax=None):
    """Wireframe mesh viewer (showerScript.py equivalent)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    ax.triplot(_triangulation(mesh), lw=0.4, color="k")
    ax.set_aspect("equal")
    return ax


def plot_scalar(mesh: Mesh, values, ax=None, cmap="viridis", vmin=None, vmax=None,
                label=None, shading="gouraud"):
    """Nodal scalar field as tripcolor (poisson.py:290-296 style)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    tpc = ax.tripcolor(
        _triangulation(mesh), np.asarray(values), shading=shading, cmap=cmap,
        vmin=vmin, vmax=vmax,
    )
    ax.figure.colorbar(tpc, ax=ax, label=label)
    ax.set_aspect("equal")
    return ax


def plot_velocity(mesh: Mesh, u, ax=None, skip=3, scale=10.0, background=None,
                  normalize=True, cmap="plasma", vmin=None, vmax=None):
    """Quiver (+ optional scalar background) — StokesColor.py:514-533 style
    (unit-normalized arrows by default, like its ``unit_vectors``)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    u = np.asarray(u)
    if background is not None:
        ax.tripcolor(
            _triangulation(mesh), np.asarray(background), shading="gouraud",
            cmap=cmap, vmin=vmin, vmax=vmax,
        )
    arrows = u.copy()
    if normalize:
        mag = np.linalg.norm(arrows, axis=1, keepdims=True)
        mag[mag == 0] = 1.0
        arrows = arrows / mag
    sel = np.arange(mesh.n_nodes)[::skip]
    ax.quiver(
        mesh.coords[sel, 0], mesh.coords[sel, 1], arrows[sel, 0], arrows[sel, 1],
        angles="xy", scale_units="xy", scale=scale, color="k", linewidth=0.6,
    )
    ax.set_aspect("equal")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    return ax


def plot_streamlines(mesh: Mesh, u, ax=None, density=1.2, grid_n=100,
                     interp: str = "linear"):
    """Streamlines via grid interpolation (stokes_clean_for_report.py:565-569).

    ``interp="cubic"`` reproduces the smoother ``griddata(..., 'cubic')``
    dashboards of ``scripts/good_visualization.py:729-740``."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    # writable copy: CubicTriInterpolator renumbers z in place, and arrays
    # exported from jax are read-only views
    u = np.array(u)
    tri = _triangulation(mesh)
    gx, gy = np.meshgrid(np.linspace(0.01, 0.99, grid_n), np.linspace(0.01, 0.99, grid_n))
    if interp == "cubic":
        make = lambda f: mtri.CubicTriInterpolator(tri, f, kind="geom")
    else:
        make = lambda f: mtri.LinearTriInterpolator(tri, f)
    ux = make(u[:, 0])(gx, gy)
    uy = make(u[:, 1])(gx, gy)
    ax.streamplot(gx, gy, ux.filled(0.0), uy.filled(0.0), density=density, color="w")
    ax.set_aspect("equal")
    return ax


def dashboard(mesh: Mesh, u, p, vorticity=None, path=None):
    """3-panel velocity/pressure/vorticity figure
    (stokes_clean_for_report.py:552-605)."""
    fig, axes = plt.subplots(1, 3, figsize=(18, 5.5), constrained_layout=True)
    speed = np.linalg.norm(np.asarray(u), axis=1)
    plot_velocity(mesh, u, ax=axes[0], background=speed, cmap="viridis")
    plot_streamlines(mesh, u, ax=axes[0])
    axes[0].set_title("velocity + streamlines")
    plot_scalar(mesh, p, ax=axes[1], cmap="coolwarm", label="p")
    axes[1].set_title("pressure")
    if vorticity is not None:
        plot_scalar(mesh, vorticity, ax=axes[2], cmap="RdBu_r", label="ω")
        axes[2].set_title("vorticity")
    if path:
        fig.savefig(path, dpi=120)
    return fig


def tracer_frame(mesh: Mesh, u, points, status, ax=None, vmax=2.0):
    """Food-capture frame: speed background, white quiver, colored tracers
    (code/StokesFood.py:507-536)."""
    if ax is None:
        _, ax = plt.subplots(figsize=(7, 6))
    speed = np.linalg.norm(np.asarray(u), axis=1)
    plot_scalar(mesh, speed, ax=ax, cmap="viridis", vmin=0, vmax=vmax,
                label="|u|")
    pts = np.asarray(points)
    status = np.asarray(status)
    colors = np.where(status > 0, "red", "blue")
    ax.scatter(pts[:, 0], pts[:, 1], c=colors, s=12, zorder=5, alpha=0.9)
    ax.set_facecolor("black")
    return ax


def plot_bc_overlay(mesh: Mesh, boundary, ax=None):
    """Boundary-condition debug overlay (the commented-out debug block of
    scripts/stokes_report.py:1001-1042): walls, inner body, periodic
    masters/slaves color-coded over the mesh wireframe."""
    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    plot_mesh(mesh, ax=ax)
    c = mesh.coords
    ax.scatter(c[boundary.walls, 0], c[boundary.walls, 1], s=14, c="tab:red",
               label="walls (Dirichlet)")
    ax.scatter(c[boundary.inner, 0], c[boundary.inner, 1], s=14, c="tab:orange",
               label="inner body")
    ax.scatter(c[boundary.masters, 0], c[boundary.masters, 1], s=14,
               c="tab:green", label="periodic masters")
    ax.scatter(c[boundary.slaves, 0], c[boundary.slaves, 1], s=14,
               c="tab:blue", label="periodic slaves")
    ax.legend(loc="upper right", fontsize=7)
    return ax


def animate(
    mesh: Mesh,
    frames: Sequence[np.ndarray],
    path: str = "animation.mp4",
    fps: int = 20,
    dpi: int = 120,
    cmap: str = "plasma",
    vmin: float = 0.0,
    vmax: float = 1.0,
    writer: str | None = None,
):
    """Offline scalar-field animation → mp4/gif
    (good_visualization2.py:735-744).  Falls back to pillow/gif when
    ffmpeg is unavailable."""
    from matplotlib import animation as manim

    fig, ax = plt.subplots(figsize=(6, 6))
    tri = _triangulation(mesh)
    tpc = ax.tripcolor(tri, np.asarray(frames[0]), shading="gouraud",
                       cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_aspect("equal")

    def update(i):
        tpc.set_array(np.asarray(frames[i]))
        ax.set_title(f"frame {i}")
        return [tpc]

    ani = manim.FuncAnimation(fig, update, frames=len(frames), blit=True)
    if writer is None:
        writer = "ffmpeg" if manim.writers.is_available("ffmpeg") else "pillow"
        if writer == "pillow" and path.endswith(".mp4"):
            path = path[:-4] + ".gif"
    ani.save(path, writer=writer, fps=fps, dpi=dpi)
    plt.close(fig)
    return path


def animate_tracers(
    mesh: Mesh,
    u_frames: Sequence[np.ndarray],
    tracer_frames: Sequence[np.ndarray],
    status_frames: Sequence[np.ndarray],
    path: str = "food.mp4",
    fps: int = 20,
    dpi: int = 110,
    vmax: float = 2.0,
    writer: str | None = None,
):
    """Offline food-run movie: velocity-magnitude tripcolor background +
    white unit quiver + status-colored tracer scatter per frame — the
    reference's live StokesFood rendering (code/StokesFood.py:507-536)
    as an offline FuncAnimation export (scripts/good_visualization2.py:
    735-744).  Falls back to pillow/gif when ffmpeg is unavailable."""
    from matplotlib import animation as manim

    fig, ax = plt.subplots(figsize=(7, 6))
    tri = _triangulation(mesh)
    speed0 = np.linalg.norm(np.asarray(u_frames[0]), axis=1)
    tpc = ax.tripcolor(tri, speed0, shading="gouraud", cmap="viridis",
                       vmin=0.0, vmax=vmax)
    fig.colorbar(tpc, ax=ax, label="|u|")
    pts0 = np.asarray(tracer_frames[0])
    scat = ax.scatter(pts0[:, 0], pts0[:, 1], c="blue", s=12, zorder=5,
                      alpha=0.9)
    ax.set_aspect("equal")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_facecolor("black")

    def update(i):
        tpc.set_array(np.linalg.norm(np.asarray(u_frames[i]), axis=1))
        pts = np.asarray(tracer_frames[i])
        status = np.asarray(status_frames[i])
        scat.set_offsets(pts)
        scat.set_color(np.where(status > 0, "red", "blue"))
        eaten = int((status > 0).sum())
        ax.set_title(f"frame {i} — eaten {eaten}/{len(status)}")
        return [tpc, scat]

    ani = manim.FuncAnimation(fig, update, frames=len(tracer_frames), blit=True)
    if writer is None:
        writer = "ffmpeg" if manim.writers.is_available("ffmpeg") else "pillow"
        if writer == "pillow" and path.endswith(".mp4"):
            path = path[:-4] + ".gif"
    ani.save(path, writer=writer, fps=fps, dpi=dpi)
    plt.close(fig)
    return path


def run_with_frames(problem, steps: int, frame_interval: int,
                    field: str | Sequence[str] = "c"):
    """Run a Stokes simulation in chunks, snapshotting ``field`` between
    chunks — the decoupled version of the reference's in-loop frame lists
    (good_visualization2.py:574-577,724-726).

    ``field`` may be any state key ("c", "u", "tracers", "tracer_status")
    or a tuple of keys (frames is then a dict key → list) — for the food
    movie pass ("u", "tracers", "tracer_status") and render with
    :func:`animate_tracers`.  Returns (final_state, stacked_metrics_list,
    frames).
    """
    from tpufem.workloads import stokes

    keys = (field,) if isinstance(field, str) else tuple(field)
    state = stokes.initial_state(problem)
    frames = {k: [np.asarray(state[k])] for k in keys}
    metrics_chunks = []
    done = 0
    while done < steps:
        chunk = min(frame_interval, steps - done)
        state, metrics = stokes.run(problem, steps=chunk, state=state)
        for k in keys:
            frames[k].append(np.asarray(state[k]))
        metrics_chunks.append(metrics)
        done += chunk
    if isinstance(field, str):
        return state, metrics_chunks, frames[field]
    return state, metrics_chunks, frames

"""Smoke test of the gallery pipeline (viz + all workloads end-to-end)."""

import os
import sys


def test_gallery_quick(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import make_gallery

    make_gallery.main(str(tmp_path), quick=True)
    produced = set(os.listdir(tmp_path))
    for f in ("mesh.png", "poisson.png", "heat.png", "stokes_flow.png", "food.png"):
        assert f in produced, f
    assert any(f.startswith("dye_mixing") for f in produced)
    assert any(f.startswith("food.mp4") or f.startswith("food.gif")
               for f in produced)

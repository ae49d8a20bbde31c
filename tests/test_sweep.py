"""Squirmer-gait sweep — scientific-result parity (README.md:43-45).

The full 6000-step campaign runs on TPU in ~40 s (reproduced values:
neutral 46.7%, pusher 98.8%, puller 99.6% vs the reference's published
~50/97/98%).  The CI test runs a shortened campaign and checks the
published ordering: swimming gaits (pusher/puller) feed far better than
the neutral squirmer.
"""

import numpy as np
import pytest

from tpufem.workloads import sweep


def test_gait_ordering_short(mesh1):
    cfg = sweep.SweepConfig(steps=800, precision="f64", fused=False)
    res = sweep.food_capture_sweep(mesh1, cfg)
    neutral = res[0.0]["consumed_fraction"]
    pusher = res[-5.0]["consumed_fraction"]
    puller = res[5.0]["consumed_fraction"]
    assert pusher > neutral + 0.1
    assert puller > neutral + 0.1
    assert 0.0 < neutral < 1.0
    assert res[0.0]["tracers"] == 488  # 25×25 grid minus cylinder

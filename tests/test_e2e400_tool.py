"""Host-side pieces of the 400-clip executed-run driver (tools/e2e_400.py).

The TPU run itself is the E2E_400.json artifact; these tests pin the parts
a failed run would corrupt silently: per-label determinism of the
synthetic source (phase A and the resume must see identical clips) and
the kill-surviving progress-mark accounting that the summary's wall
clocks are computed from."""

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tool():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    try:
        import tools.e2e_400 as mod
        return mod
    finally:
        sys.path.remove(root)


def test_synth_batch_deterministic_per_label(tool):
    a = tool.synth_u8_batch([3, 7])
    b = tool.synth_u8_batch([7, 3])
    assert a.shape == (2, 32, 224, 224, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a[0], b[1])
    np.testing.assert_array_equal(a[1], b[0])
    assert not np.array_equal(a[0], a[1])


def test_synth_batch_has_spatial_structure(tool):
    x = tool.synth_u8_batch([0])[0].astype(np.float32)
    # 8x8 block upsampling → neighbouring pixels correlate strongly
    assert np.abs(np.diff(x, axis=1)).mean() < 0.5 * x.std()


def test_marks_roundtrip_and_phase_accounting(tool, tmp_path):
    d = str(tmp_path)
    tool.mark(d, phase="A", event="setup", setup_s=12.5)
    tool.mark(d, phase="A", event="batch", batch=0, clips_done=8,
              wall_s=30.0)
    tool.mark(d, phase="A", event="batch", batch=1, clips_done=16,
              wall_s=61.0)
    # simulated kill: no finalize mark for phase A
    tool.mark(d, phase="B", event="setup", setup_s=10.0)
    tool.mark(d, phase="B", event="rescored", clips=16, wall_s=20.0)
    tool.mark(d, phase="B", event="batch", batch=0, clips_done=8,
              wall_s=25.0)
    tool.mark(d, phase="B", event="finalized", attack_wall_s=50.0,
              finalize_wall_s=5.0)
    marks = tool.read_marks(d)
    assert len(marks) == 7
    assert all("ts" in m for m in marks)
    a_batches = [m for m in marks if m["phase"] == "A"
                 and m["event"] == "batch"]
    # phase A wall = setup + LAST surviving batch mark
    assert 12.5 + a_batches[-1]["wall_s"] == 73.5

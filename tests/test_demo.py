"""Scripted smoke of the interactive demo (the reference hotkey workflow,
PostProcessor.cpp:659-716) — toggles, sharpness/radius nudges, deferred
capture, clean exit."""

import sys
from pathlib import Path

import numpy as np


def test_demo_scripted_run(tmp_path, capsys):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import demo

    argv = sys.argv
    sys.argv = ["demo.py", "--frames", "8", "--keys", "d+]c", "--size",
                "96x80", "--out", str(tmp_path)]
    try:
        demo.main()
    finally:
        sys.argv = argv

    out = capsys.readouterr().out
    assert "sharpness=0.95" in out        # '+' nudge applied
    assert "radius=0.55" in out           # ']' nudge applied
    assert "captured:" in out             # 'c' captured on the NEXT frame
    caps = list(tmp_path.glob("capture_*_fsr_s95_r55.*"))
    assert caps, list(tmp_path.iterdir())
    npy = [p for p in caps if p.suffix == ".npy"]
    assert npy and np.load(npy[0]).shape == (103, 124, 4)  # (OH, OW, 4)

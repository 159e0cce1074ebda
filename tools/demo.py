#!/usr/bin/env python
"""Interactive demo — the reference's hotkey workflow (README.md:93-111) on a
synthetic or file-based frame stream.

Key map (reference default is F1..F7 via Win32 GetAsyncKeyState,
PostProcessor.cpp:659-716; terminals get letters):

  n  toggle FSR <-> NIS          (F1)
  d  toggle debug mode           (F2)
  -/+  sharpness -/+ 0.05        (F3/F4)
  [/]  radius -/+ 0.05           (F5/F6)
  c  capture output to DDS+NPY   (F7)
  q  quit

Every change rebuilds pipeline resources (Reset() semantics) and the rolling
500-frame GPU-time average is logged like the reference debug mode.

Usage:
  python tools/demo.py                        # interactive, synthetic frames
  python tools/demo.py --frames 50 --keys ndc # scripted (CI-friendly)
  python tools/demo.py --input capture.dds --render-scale 0.75
"""

import argparse
import select
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openvr_fsr_tpu import Config, Pipeline  # noqa: E402
from openvr_fsr_tpu.api.capture import save_frame, read_dds_rgba8  # noqa: E402
from openvr_fsr_tpu.utils import frames as FR  # noqa: E402


def _poll_key(timeout=0.0):
    if not sys.stdin.isatty():
        return None
    r, _, _ = select.select([sys.stdin], [], [], timeout)
    return sys.stdin.read(1) if r else None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="DDS or NPY frame to stream (synthetic "
                                    "zone plate otherwise)")
    ap.add_argument("--render-scale", type=float, default=0.77)
    ap.add_argument("--sharpness", type=float, default=0.9)
    ap.add_argument("--radius", type=float, default=0.5)
    ap.add_argument("--nis", action="store_true")
    ap.add_argument("--size", default="1280x720",
                    help="synthetic input size WxH")
    ap.add_argument("--frames", type=int, default=0,
                    help="process N frames then exit (0 = interactive)")
    ap.add_argument("--keys", default="",
                    help="scripted key presses, one per frame")
    ap.add_argument("--out", default="captures")
    args = ap.parse_args()

    if args.input:
        p = Path(args.input)
        frame = (np.load(p) if p.suffix == ".npy" else read_dds_rgba8(p))
    else:
        w, h = (int(v) for v in args.size.split("x"))
        frame = FR.zone_plate_frame(h, w)

    cfg = Config(enabled=True, render_scale=args.render_scale,
                 sharpness=args.sharpness, radius=args.radius,
                 use_nis=args.nis, debug_mode=True)
    pipe = Pipeline(cfg)
    print(f"input {frame.shape[1]}x{frame.shape[0]} -> "
          f"{pipe.output_size(frame.shape[1], frame.shape[0])}  "
          f"[{'NIS' if cfg.use_nis else 'FSR'}]  keys: n d - + [ ] c q")

    actions = {
        "n": pipe.toggle_nis,
        "d": pipe.toggle_debug,
        "-": lambda: pipe.adjust_sharpness(-0.05),
        "+": lambda: pipe.adjust_sharpness(+0.05),
        "[": lambda: pipe.adjust_radius(-0.05),
        "]": lambda: pipe.adjust_radius(+0.05),
    }

    scripted = list(args.keys)
    n = 0
    capture_next = False
    t0 = time.time()
    while True:
        out = pipe.process(frame)
        n += 1
        if capture_next:
            paths = save_frame(np.asarray(out), args.out,
                               use_nis=pipe.config.use_nis,
                               sharpness=pipe.config.sharpness,
                               radius=pipe.config.radius)
            print("captured:", ", ".join(str(p) for p in paths))
            capture_next = False
        key = scripted.pop(0) if scripted else _poll_key()
        if key == "q":
            break
        if key == "c":
            capture_next = True  # captured on next frame, like the reference
        elif key in actions:
            actions[key]()
            c = pipe.config
            print(f"[{'NIS' if c.use_nis else 'FSR'}] sharpness={c.sharpness:.2f} "
                  f"radius={c.radius:.2f} debug={c.debug_mode}")
        if args.frames and n >= args.frames:
            break
    dt = time.time() - t0
    print(f"{n} frames in {dt:.2f}s ({n / dt:.1f} fps incl. python overhead)")


if __name__ == "__main__":
    main()

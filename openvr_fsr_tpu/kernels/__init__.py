"""Pallas TPU kernels — the performance path.

Each kernel is validated against the same NumPy oracle as the XLA ops in
`ops/` (the math cores are shared, so the f32 op ordering is identical by
construction; only the gather mechanism differs)."""

from .fsr import build_fsr_fused  # noqa: F401

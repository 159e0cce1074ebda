"""Jittable JAX ops (the XLA path).

These mirror the oracle math exactly (same f32 op ordering) but are written
for XLA/TPU: planar (H, W) channel arrays so the image width lands on VPU
lanes, static gather index maps baked at trace time, branch-free `where`
selects. The Pallas kernels in `..kernels` are the hand-tuned fast path; these
ops are the always-available reference path and the fallback on CPU.
"""

from . import common
from .easu import easu_jax
from .rcas import rcas_jax
from .bilinear import bilinear_sample_jax, bilinear_fallback_fsr_jax
from .nis import nvscaler_jax, nvsharpen_jax

__all__ = [
    "common",
    "easu_jax",
    "rcas_jax",
    "bilinear_sample_jax",
    "bilinear_fallback_fsr_jax",
    "nvscaler_jax",
    "nvsharpen_jax",
]

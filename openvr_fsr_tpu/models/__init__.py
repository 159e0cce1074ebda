"""Upscaler model families — one class per algorithm family the reference
ships, over the shared pipeline/kernels:

  FsrModel — AMD FidelityFX Super Resolution 1 (EASU + RCAS), the default
  NisModel — NVIDIA Image Scaling (NVScaler / NVSharpen)
  CasModel — FFX Contrast-Adaptive Sharpening (sharpen-only or
             sharpen-and-upscale, ffx_cas.h; a full pipeline mode here —
             the reference keeps it in-tree but out of the build)

`get_model(name)` resolves by the names users know from the cfg/README.
"""

from .families import FsrModel, NisModel, CasModel, get_model, MODELS

__all__ = ["FsrModel", "NisModel", "CasModel", "get_model", "MODELS"]

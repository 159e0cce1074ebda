"""openvr_fsr_tpu — a TPU-native spatial upscaling framework.

Re-implements the full capability surface of fholger/openvr_fsr (AMD
FidelityFX Super Resolution 1 = EASU upscale + RCAS sharpen, NVIDIA Image
Scaling = NVScaler upscale / NVSharpen sharpen, foveated-radius blending,
stereo eye handling, config system, capture/bench tooling) as an idiomatic
JAX / Pallas framework for TPU.

Layers (bottom up):
  oracle/   — bit-exact NumPy golden reference of the HLSL kernel math
  core/     — config & constant derivation (FsrEasuCon / FsrRcasCon / NISConfig)
  ops/      — jittable JAX ops (XLA path) mirroring the oracle exactly
  kernels/  — fused Pallas TPU kernels (the fast path)
  models/   — upscaler model families (FSR, NIS, CAS)
  api/      — `upscale()` + stateful `Pipeline`
  parallel/ — device-mesh sharding for batched streams
  utils/    — frames, timing, capture, logging
"""

from .version import __version__
from .core.config import Config, load_config
from .api.pipeline import Pipeline, upscale
from .models import get_model, FsrModel, NisModel, CasModel

__all__ = ["__version__", "Config", "load_config", "Pipeline", "upscale",
           "get_model", "FsrModel", "NisModel", "CasModel"]

"""Model-family wrappers over the pipeline and kernels.

Each family is a thin, stateful facade with the family's own knobs; heavy
lifting (jit caching, kernel selection, foveation, formats) stays in
api.Pipeline. CAS has no pipeline mode in the current reference build
(SURVEY.md §2: absent from src/CMakeLists.txt:58-90), so CasModel drives the
op directly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..api.pipeline import Pipeline
from ..core.config import Config

__all__ = ["FsrModel", "NisModel", "CasModel", "get_model", "MODELS"]


class _PipelineModel:
    _use_nis = False

    def __init__(self, render_scale=0.77, sharpness=0.9, radius=0.5,
                 debug=False, eye_centers=None, color_bits=None,
                 backend="auto"):
        cfg = Config(enabled=True, use_nis=self._use_nis,
                     render_scale=float(render_scale),
                     sharpness=float(sharpness), radius=float(radius),
                     debug_mode=bool(debug))
        self.pipeline = Pipeline(cfg, eye_centers=eye_centers,
                                 color_bits=color_bits, backend=backend)

    @property
    def config(self):
        return self.pipeline.config

    def __call__(self, frames, eyes=None):
        return self.pipeline.process(frames, eyes=eyes)

    def sharded(self, mesh=None):
        from ..parallel.sharding import ShardedPipeline
        return ShardedPipeline(self.pipeline, mesh)


class FsrModel(_PipelineModel):
    """AMD FidelityFX Super Resolution 1: EASU upscale + RCAS sharpen
    (renderScale != 1), RCAS only at renderScale == 1."""

    _use_nis = False


class NisModel(_PipelineModel):
    """NVIDIA Image Scaling: NVScaler upscale (renderScale != 1) or
    NVSharpen (renderScale == 1)."""

    _use_nis = True


class CasModel:
    """FFX CAS sharpen-only (ops/cas.py; oracle in oracle/cas.py)."""

    def __init__(self, sharpness=0.8, max_color_delta=1.0):
        self.sharpness = float(sharpness)
        self.max_color_delta = float(max_color_delta)
        self._cache = {}

    def __call__(self, frames):
        """frames: (H, W, 4|3) or (B, H, W, 4|3) uint8. Returns sharpened
        uint8 RGB(A) at the same size (alpha passes through)."""
        from ..ops.cas import cas_sharpen_jax
        from ..utils.frames import to_planar, from_planar

        frames = np.asarray(frames)
        squeeze = frames.ndim == 3
        x = frames[None] if squeeze else frames
        key = (x.shape, str(x.dtype), self.sharpness, self.max_color_delta)
        fn = self._cache.get(key)
        if fn is None:
            sharp, mcd = self.sharpness, self.max_color_delta

            def run(f):
                planar = to_planar(f)
                rgb = jax.vmap(lambda p: cas_sharpen_jax(p[:3], sharp, mcd))(
                    planar)
                return from_planar(
                    jnp.concatenate([rgb, planar[:, 3:]], axis=1))

            fn = jax.jit(run)
            self._cache[key] = fn
        out = fn(x)
        return out[0] if squeeze else out


MODELS = {"fsr": FsrModel, "nis": NisModel, "cas": CasModel}


def get_model(name, **kw):
    """Resolve a model family by name ('fsr', 'nis', 'cas')."""
    return MODELS[name.lower()](**kw)

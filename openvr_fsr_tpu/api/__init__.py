from .pipeline import Pipeline, upscale
from .capture import save_frame

__all__ = ["Pipeline", "upscale", "save_frame"]

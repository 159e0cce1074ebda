"""Spatial (row-strip) sharding — single-frame latency scaling.

`sharding.ShardedPipeline` scales THROUGHPUT by putting whole frames on
different chips; this module scales the LATENCY of one stereo pair by
splitting the fused FSR kernel's output row bands across devices. It goes
beyond the reference (single-GPU, SURVEY.md §2's parallelism inventory) and
beyond batch DP: the per-band index maps, foveation circles and derived-rows
structures are computed for the FULL image and sliced per shard
(kernels/fsr.build_fsr_fused(band_range=...)), so every shard runs the
same program family on its strip and the concatenated strips are
BIT-IDENTICAL to the single-device kernel (tests/test_spatial.py).

No collectives in the hot path: EASU/bilinear read at most a few input rows
beyond a band, so shards take overlapping input strips at distribution time
(halo-by-overlap, the standard trick for stencil spatial decomposition —
ICI/DCN only carries the initial strip scatter and the output gather).
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..core import constants as C
from ..core.projection import default_centers
from ..kernels import _band as BD
from ..kernels.cas import build_cas_upscale, cas_band_layout
from ..kernels.fsr import build_fsr_fused, fsr_band_layout

__all__ = ["SpatialFsrPipeline", "split_bands"]


def split_bands(gy, n):
    """Contiguous band ranges covering [0, gy) as evenly as possible."""
    n = max(1, min(int(n), gy))
    bounds = np.linspace(0, gy, n + 1).round().astype(int)
    return [(int(bounds[i]), int(bounds[i + 1])) for i in range(n)]


class SpatialFsrPipeline:
    """Latency-sharded fused FSR (EASU+RCAS) over explicit devices.

    config: core.config.Config with render_scale != 1 — the fused
    EASU+RCAS path (rs < 1 upscale or rs > 1 supersample) or the CAS
    scaling path (use_cas, rs < 1); other modes scale via batch DP in
    sharding.ShardedPipeline.
    devices: list of jax devices (default: all). Frames are (B, H, W)
    uint32 packed RGBA8 or (B, H, W, 4) uint8; single-eye-per-frame
    layout with `eyes` like Pipeline.process.
    """

    def __init__(self, config, eye_centers=None, devices=None,
                 band_rows=128, interpret=False):
        assert config.enabled and not config.use_nis
        assert config.render_scale != 1.0 and (
            not config.use_cas or config.render_scale < 1.0), \
            "spatial sharding targets the scaling kernels (fused " \
            "EASU+RCAS rs != 1, or CAS upscale rs < 1)"
        self.config = config
        self.eye_centers = eye_centers or default_centers()
        self.devices = list(devices) if devices is not None else jax.devices()
        self.band_rows = int(band_rows)
        self.interpret = interpret   # CPU-mesh testing of the Pallas strips
        self._cache = {}

    def _centres_array(self, out_w, out_h, eyes):
        return C.centres_payload(out_w, out_h, self.config.radius,
                                 self.eye_centers, eyes)

    def _build(self, b, h, w, eyes):
        cfg = self.config
        ow, oh = cfg.output_size(w, h)
        layout = cas_band_layout if cfg.use_cas else fsr_band_layout
        builder = build_cas_upscale if cfg.use_cas else build_fsr_fused
        th, gy = layout(ow, oh, self.band_rows)
        ranges = split_bands(gy, len(self.devices))
        centres = self._centres_array(ow, oh, eyes)
        shards = []
        for (g0, g1), dev in zip(ranges, self.devices):
            fn = builder(
                b, h, w, ow, oh, sharpness=cfg.sharpness, centres=centres,
                color_bits=8, debug=cfg.debug_mode,
                band_rows=self.band_rows, band_range=(g0, g1),
                interpret=self.interpret)
            shards.append((jax.jit(fn), fn.in_row_base, fn.in_rows,
                           fn.out_rows, dev))
        return shards, BD.input_padding(h, w), (oh, ow)

    def place(self, frames, eyes=None):
        """Scatter half of the steady state: pad the frame once on the host
        and `device_put` each shard's overlapping input strip onto its
        device (pre-padded to the strip kernel's published pitch, so the
        jitted call consumes it with zero relayout). Returns a placed-frames
        handle for process_placed. This is the ONLY step that touches the
        host; a streaming caller double-buffers place(frame t+1) against
        process_placed(frame t) to overlap transport with compute."""
        frames = np.asarray(frames)
        if frames.dtype == np.uint8:         # NHWC -> packed u32 plane
            frames = np.ascontiguousarray(frames).view(np.uint32)[..., 0]
        b, h, w = frames.shape
        if eyes is None:
            eyes = tuple(i % 2 for i in range(b))
        assert len(eyes) == b, (len(eyes), b)
        key = (b, h, w, tuple(eyes))
        if key not in self._cache:
            self._cache[key] = self._build(b, h, w, eyes)
        shards, (hp, wp), _ = self._cache[key]
        pad = np.pad(frames, ((0, 0), (0, hp - h), (0, wp - w)))
        strips = [
            jax.device_put(np.ascontiguousarray(pad[:, base:base + rows]),
                           dev)
            for _, base, rows, _, dev in shards]
        return key, strips

    def process_placed(self, placed):
        """Compute half of the steady state: run every shard's strip kernel
        on its own device and return the per-device output strips in band
        order, still device-resident. No host staging — the driver's
        dryrun asserts this under jax.transfer_guard('disallow')."""
        key, strips = placed
        shards = self._cache[key][0]
        return [shard[0](strip) for shard, strip in zip(shards, strips)]

    def gather(self, key, outs):
        """Explicit gather: pull the device-resident output strips and
        concatenate to the (B, OH, OW) packed frame (host array)."""
        shards = self._cache[key][0]
        return np.concatenate(
            [np.asarray(o)[:, :shard[3]] for o, shard in zip(outs, shards)],
            axis=1)

    def process(self, frames, eyes=None):
        """One-shot convenience: place + process_placed + gather.
        Returns (B, OH, OW) uint32 packed RGBA8 (the serving format).
        eyes defaults to alternating (0, 1, 0, ...) like Pipeline.process."""
        placed = self.place(frames, eyes)
        return self.gather(placed[0], self.process_placed(placed))

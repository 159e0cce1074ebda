"""The post-processing pipeline — JAX analog of vr::PostProcessor.

Reference orchestration being reproduced (src/postprocess/PostProcessor.cpp):
  - output sizing: rs<1 -> out=in/rs, rs>=1 -> out=in*rs  (:512-518)
  - stage truth table: upscale iff rs!=1; sharpen iff (!NIS || rs==1)
    (:530-535, 586-594)
  - per-eye constant buffers with projection-centred foveation circles
    (:293-310, 416-430)
  - every stage writes to a UNORM texture (RGBA8, or R10G10B10A2 passthrough
    for 10-bit inputs), so the EASU->RCAS handoff is quantized (:527, 63-74)
  - lazy per-(shape,config) resource creation = jit cache keyed the same way
    (:136-153); `Reset()` = dropping the cache

A `Pipeline` is stateful like the reference PostProcessor (including the
hotkey-style runtime mutators); `upscale()` is the one-shot functional form.
"""


import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core import constants as C
from ..core import foveation as fov
from ..core.projection import default_centers
from ..ops.easu import easu_jax
from ..ops.rcas import rcas_jax
from ..ops.bilinear import bilinear_fallback_fsr_jax
from ..ops.nis import nvscaler_jax, nvsharpen_jax
from ..utils.frames import to_planar, from_planar
from ..utils.log import get_logger
from ..utils.timing import GpuTimer
from .capture import save_frame

__all__ = ["Pipeline", "upscale"]

F32 = np.float32


def _tint(debug):
    """Out-of-radius debug tint: 1 - debug*(0, 0.3, 0.3, 0)
    (fsr_rcas.hlsl:46, NIS DirectCopy)."""
    d = 1.0 if debug else 0.0
    return np.array([1.0, 1.0 - 0.3 * d, 1.0 - 0.3 * d, 1.0], np.float32)


def _packed_run(kern):
    """8-bit IO wrapper for the Pallas kernels (which consume/produce
    (B, H, W) uint32 bitcast-RGBA8 planes). uint8 NHWC frames are bitcast
    at the boundary; uint32 frames pass through zero-copy — the TPU tiles
    u8 as (32, 128) but u32 as (8, 128), so skipping the bitcast skips an
    XLA relayout pass on both sides."""
    def run(frames):
        x = jnp.asarray(frames)
        if x.dtype == jnp.uint32:            # zero-copy packed plane
            return kern(x if x.ndim == 3 else x[None])
        x = x if x.ndim == 4 else x[None]
        if x.shape[-1] == 3:                 # RGB input: opaque alpha
            x = jnp.concatenate(
                [x, jnp.full(x.shape[:-1] + (1,), 255, x.dtype)], axis=-1)
        packed = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(kern(packed), jnp.uint8)
    run.pad_to = getattr(kern, "pad_to", None)
    run.dma_geometry = getattr(kern, "dma_geometry", None)
    return run


def _jit_io(run):
    """jit a builder's IO fn, carrying the kernel's published DMA pitch
    (fn.pad_to — the pre-pad shape device-ring frames must use) through to
    the function callers get from _build."""
    jfn = jax.jit(run)
    pad_to = getattr(run, "pad_to", None)
    if pad_to is not None:
        jfn.pad_to = pad_to
    geom = getattr(run, "dma_geometry", None)
    if geom is not None:
        jfn.dma_geometry = geom
    return jfn


class Pipeline:
    """Stateful stereo post-processing pipeline.

    Args:
      config: Config (render_scale / sharpness / use_nis / radius / debug_mode).
      eye_centers: ((lx,ly),(rx,ry)) normalized projection centres; defaults to
        image centres (symmetric projection, no cant).
      single_eye_per_frame: True = each batch entry is one eye (the reference's
        textureContainsOnlyOneEye); False = double-wide frames holding both.
      color_bits: None = auto (8); 10 emulates the R10G10B10A2 passthrough.
    """

    def __init__(self, config: Config = None, eye_centers=None,
                 single_eye_per_frame=True, color_bits=None, backend="auto",
                 precision="full", hdr_mode=0, cas_max_color_delta=1.0):
        self.config = config or Config(enabled=True)
        self.eye_centers = eye_centers or default_centers()
        self.single_eye_per_frame = single_eye_per_frame
        self.color_bits = int(color_bits or 8)
        self.alpha_bits = 8 if self.color_bits == 8 else 2
        self.backend = backend  # auto | pallas | xla | pallas-interpret
        self.precision = precision  # full (oracle parity) | half (fp16 analog)
        # NIS_HDR_MODE: 0 none (the mod's shipped build), 1 linear, 2 PQ
        # (NIS_Scaler.h:112-116). Affects NIS paths only.
        self.hdr_mode = int(hdr_mode)
        # CasSetup maxColorDelta (ffx_cas.h:379, 1 = unlimited sharpening);
        # clamps the sharpen-only CAS path only (:876-878 skips it when
        # scaling). Affects CAS mode only.
        self.cas_max_color_delta = float(cas_max_color_delta)
        self._cache = {}
        self.timer = GpuTimer(scale_for_stereo=single_eye_per_frame)
        self._log = get_logger()
        self._capture_armed = None   # (directory, formats) when armed
        self.last_capture_paths = []

    def _resolve_backend(self):
        if self.backend == "auto":
            return "pallas" if jax.default_backend() == "tpu" else "xla"
        return self.backend

    # --- reference hotkey actions (PostProcessor.cpp:659-716) ---------------
    def reset(self):
        """Drop compiled resources (PostProcessor::Reset analog)."""
        self._cache.clear()

    def toggle_nis(self):
        self.config = self.config.with_(use_nis=not self.config.use_nis)
        self._log.info("Now using %s", "NIS" if self.config.use_nis else "FSR")
        self.reset()

    def toggle_debug(self):
        self.config = self.config.with_(debug_mode=not self.config.debug_mode)
        self._log.info("Debug mode is now %s",
                       "enabled" if self.config.debug_mode else "disabled")
        self.reset()

    def adjust_sharpness(self, delta):
        s = max(self.config.sharpness + delta, 0.0)
        self.config = self.config.with_(sharpness=s)
        self._log.info("Sharpness is now at %g", s)
        self.reset()

    def adjust_radius(self, delta):
        r = max(self.config.radius + delta, 0.0)
        self.config = self.config.with_(radius=r)
        self._log.info("Sharpening radius is now at %g", r)
        self.reset()

    # -------------------------------------------------------------------------
    def output_size(self, in_w, in_h):
        return self.config.output_size(in_w, in_h)

    def _masks(self, out_w, out_h, tile, eyes):
        """Per-batch-entry pixel masks for one stage."""
        pl, pr = self.eye_centers
        masks = []
        if self.single_eye_per_frame:
            per_eye = {}
            for e in set(eyes):
                fc = C.foveation_constants(out_w, out_h, self.config.radius,
                                           pl, pr, True, e)
                per_eye[e] = fov.pixel_mask(out_w, out_h, tile,
                                            (fc.centre_left, fc.centre_right),
                                            fc.radius_sq)
            masks = [per_eye[e] for e in eyes]
        else:
            fc = C.foveation_constants(out_w, out_h, self.config.radius,
                                       pl, pr, False)
            m = fov.pixel_mask(out_w, out_h, tile,
                               (fc.centre_left, fc.centre_right), fc.radius_sq)
            masks = [m for _ in eyes]
        return np.stack(masks)

    def _centres_array(self, out_w, out_h, eyes):
        """Per-batch-entry imageCentre/radius cbuffer rows
        (core.constants.centres_payload, PostProcessor.cpp:298-305)."""
        return C.centres_payload(out_w, out_h, self.config.radius,
                                 self.eye_centers, eyes,
                                 self.single_eye_per_frame)

    def _build_fsr_fused(self, b, h, w, eyes, interpret):
        """Fused Pallas EASU+RCAS path (kernels/fsr.py) — one launch for the
        whole stereo batch, replacing the two-dispatch XLA pipeline."""
        from ..kernels.fsr import build_fsr_fused

        cfg = self.config
        out_w, out_h = cfg.output_size(w, h)
        fused = build_fsr_fused(
            b, h, w, out_w, out_h, sharpness=cfg.sharpness,
            centres=self._centres_array(out_w, out_h, eyes),
            color_bits=self.color_bits, debug=cfg.debug_mode,
            precision=self.precision, interpret=interpret)
        color_bits, alpha_bits = self.color_bits, self.alpha_bits

        if color_bits == 8:
            # packed-u32 IO: RGBA8 frames bitcast to one u32 plane (or taken
            # zero-copy when already uint32), the kernel unpacks/packs
            # channels with integer shifts — no NHWC<->planar transpose
            run = _packed_run(fused)
        else:
            def run(frames):
                x = frames if frames.ndim == 4 else frames[None]
                ints = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))[:, :3]
                rgb = fused(ints.astype(jnp.float32))
                alpha = jnp.ones((b, 1, out_h, out_w), jnp.float32)
                return from_planar(jnp.concatenate([rgb, alpha], axis=1),
                                   color_bits, alpha_bits)

        return _jit_io(run)

    def _build_rcas_sharpen(self, b, h, w, eyes, interpret):
        """Sharpen-only Pallas path (kernels/rcas.py) for renderScale == 1."""
        from ..kernels.rcas import build_rcas_sharpen

        cfg = self.config
        sharpen = build_rcas_sharpen(
            b, h, w, sharpness=cfg.sharpness,
            centres=self._centres_array(w, h, eyes),
            color_bits=self.color_bits, debug=cfg.debug_mode,
            precision=self.precision, interpret=interpret)
        color_bits, alpha_bits = self.color_bits, self.alpha_bits

        if color_bits == 8:
            run = _packed_run(sharpen)
        else:
            def run(frames):
                x = frames if frames.ndim == 4 else frames[None]
                ints = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
                return from_planar(sharpen(ints.astype(jnp.float32)),
                                   color_bits, alpha_bits)

        return _jit_io(run)

    def _build_nvsharpen(self, b, h, w, eyes, interpret):
        """NVSharpen Pallas path (kernels/nis.py) for NIS at renderScale == 1."""
        from ..kernels.nis import build_nvsharpen

        cfg = self.config
        nis_cfg = C.nvsharpen_update_config(cfg.sharpness, w, h, w, h,
                                            hdr_mode=self.hdr_mode)
        sharpen = build_nvsharpen(
            b, h, w, nis_cfg=nis_cfg, centres=self._centres_array(w, h, eyes),
            color_bits=self.color_bits, debug=cfg.debug_mode,
            precision=self.precision, interpret=interpret)
        color_bits, alpha_bits = self.color_bits, self.alpha_bits

        if color_bits == 8:
            run = _packed_run(sharpen)
        else:
            def run(frames):
                x = frames if frames.ndim == 4 else frames[None]
                ints = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
                return from_planar(sharpen(ints.astype(jnp.float32)),
                                   color_bits, alpha_bits)

        return _jit_io(run)

    def _build_nvscaler(self, b, h, w, eyes, interpret):
        """NVScaler Pallas path (kernels/nis.py) for NIS upscaling.

        The kernel is exact everywhere including texture borders: its edge
        map carries dedicated one-hot blocks reproducing the reference's
        shared-memory clamp composition (clip(clip(p)+-1),
        NIS_Scaler.h:630-668), so no border patching is needed."""
        from ..kernels.nis import build_nvscaler

        cfg = self.config
        out_w, out_h = cfg.output_size(w, h)
        nis_cfg = C.nvscaler_update_config(
            cfg.sharpness, w, h, w, h, out_w, out_h, out_w, out_h,
            hdr_mode=self.hdr_mode)
        scaler = build_nvscaler(
            b, h, w, out_w, out_h, nis_cfg=nis_cfg,
            centres=self._centres_array(out_w, out_h, eyes),
            color_bits=self.color_bits, debug=cfg.debug_mode,
            precision=self.precision, interpret=interpret)
        color_bits, alpha_bits = self.color_bits, self.alpha_bits

        if color_bits == 8:
            run = _packed_run(scaler)
        else:
            def run(frames):
                x = frames if frames.ndim == 4 else frames[None]
                ints = jnp.transpose(jnp.asarray(x),
                                     (0, 3, 1, 2)).astype(jnp.float32)
                return from_planar(scaler(ints), color_bits, alpha_bits)

        return _jit_io(run)

    def _build_cas_upscale(self, b, h, w, eyes, interpret):
        """CAS scaling path (kernels/cas.py) — CasFilter noScaling=false
        sharpens and upscales in one pass (ffx_cas.h:552-892)."""
        from ..kernels.cas import build_cas_upscale

        cfg = self.config
        out_w, out_h = cfg.output_size(w, h)
        from ..oracle.cas import cas_support_scaling
        if not cas_support_scaling(out_w, out_h, w, h):
            self._log.info(
                "CAS scale factor above the 4x area limit "
                "(ffx_cas.h:368-372) — output follows the filter anyway")
        scaler = build_cas_upscale(
            b, h, w, out_w, out_h, sharpness=cfg.sharpness,
            centres=self._centres_array(out_w, out_h, eyes),
            color_bits=self.color_bits, debug=cfg.debug_mode,
            precision=self.precision, interpret=interpret)
        color_bits, alpha_bits = self.color_bits, self.alpha_bits

        if color_bits == 8:
            run = _packed_run(scaler)
        else:
            def run(frames):
                x = frames if frames.ndim == 4 else frames[None]
                ints = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))[:, :3]
                rgb = scaler(ints.astype(jnp.float32))
                alpha = jnp.ones((b, 1, out_h, out_w), jnp.float32)
                return from_planar(jnp.concatenate([rgb, alpha], axis=1),
                                   color_bits, alpha_bits)

        return _jit_io(run)

    def _build_cas_sharpen(self, b, h, w, eyes, interpret):
        """CAS sharpen-only path (kernels/cas.py, noScaling=true) for
        renderScale == 1."""
        from ..kernels.cas import build_cas_sharpen

        cfg = self.config
        sharpen = build_cas_sharpen(
            b, h, w, sharpness=cfg.sharpness,
            centres=self._centres_array(w, h, eyes),
            color_bits=self.color_bits, debug=cfg.debug_mode,
            max_color_delta=self.cas_max_color_delta,
            precision=self.precision, interpret=interpret)
        color_bits, alpha_bits = self.color_bits, self.alpha_bits

        if color_bits == 8:
            run = _packed_run(sharpen)
        else:
            def run(frames):
                x = frames if frames.ndim == 4 else frames[None]
                ints = jnp.transpose(jnp.asarray(x), (0, 3, 1, 2))
                return from_planar(sharpen(ints.astype(jnp.float32)),
                                   color_bits, alpha_bits)

        return _jit_io(run)

    def _build(self, b, h, w, eyes):
        fn = self._build_impl(b, h, w, eyes)
        if getattr(fn, "pad_to", None) is None:
            # Non-Pallas builds (XLA fallback, 10-bit planar) still publish
            # the serving pre-pad pitch so bench/ring tools don't crash on
            # CPU hosts. Only the Pallas kernels treat pre-padded frames
            # natively; the XLA fallback processes pad rows as pixels
            # (bench-fallback behavior, unchanged from the hand-computed
            # pitch these tools used before fn.pad_to existed).
            from ..kernels import _band as _bd
            fn.pad_to = _bd.input_padding(h, w)
        return fn

    def _build_impl(self, b, h, w, eyes):
        cfg = self.config
        if cfg.use_nis and cfg.use_cas:
            raise ValueError("use_nis and use_cas are mutually exclusive")
        out_w, out_h = cfg.output_size(w, h)
        do_up, do_sh = cfg.stage_plan()
        backend = self._resolve_backend()
        if backend in ("pallas", "pallas-interpret"):
            interpret = backend == "pallas-interpret"
            if cfg.use_cas:
                if do_up:
                    return self._build_cas_upscale(b, h, w, eyes, interpret)
                return self._build_cas_sharpen(b, h, w, eyes, interpret)
            if not cfg.use_nis:
                if do_up and do_sh:
                    return self._build_fsr_fused(b, h, w, eyes, interpret)
                if do_sh:  # renderScale == 1: sharpen only (PostProcessor:530)
                    return self._build_rcas_sharpen(b, h, w, eyes, interpret)
            elif do_sh and not do_up:  # NIS at renderScale == 1: NVSharpen
                return self._build_nvsharpen(b, h, w, eyes, interpret)
            elif do_up:                # NIS upscale: NVScaler
                return self._build_nvscaler(b, h, w, eyes, interpret)
            # No kernel covers this stage plan. An explicitly requested
            # Pallas backend must not silently run XLA.
            if self.backend != "auto":
                raise NotImplementedError(
                    f"backend={self.backend!r} has no kernel for stage plan "
                    f"(upscale={do_up}, sharpen={do_sh}, "
                    f"use_nis={cfg.use_nis}); use backend='xla' or 'auto'")
        color_bits = self.color_bits
        alpha_bits = self.alpha_bits
        tint = _tint(cfg.debug_mode)
        cscale = F32((1 << color_bits) - 1)
        ascale = F32((1 << alpha_bits) - 1)

        stages = []

        if do_up:
            up_tile = fov.TILE_NIS_SCALER if cfg.use_nis else fov.TILE_FSR
            mask_up = jnp.asarray(self._masks(out_w, out_h, up_tile, eyes))
            if cfg.use_cas:
                from ..ops.cas import cas_upscale_jax
                from ..oracle.cas import cas_support_scaling
                if not cas_support_scaling(out_w, out_h, w, h):
                    self._log.info(
                        "CAS scale factor above the 4x area limit "
                        "(ffx_cas.h:368-372) — output follows the filter anyway")

                def cas_up(rgba, mask):
                    up = cas_upscale_jax(rgba[:3], cfg.sharpness, out_w, out_h)
                    fb = bilinear_fallback_fsr_jax(rgba[:3], out_w, out_h)
                    fb = fb * jnp.asarray(tint[:3])[:, None, None]
                    rgb = jnp.where(mask[None], up, fb)
                    alpha = jnp.ones((1, out_h, out_w), jnp.float32)
                    return jnp.concatenate([rgb, alpha], axis=0)

                stages.append(("quantized_stage", jax.vmap(cas_up), mask_up))
            elif cfg.use_nis:
                nis_cfg = C.nvscaler_update_config(
                    cfg.sharpness, w, h, w, h, out_w, out_h, out_w, out_h,
                    hdr_mode=self.hdr_mode)
                if not nis_cfg.valid:
                    self._log.info(
                        "NIS scale factor outside the supported 0.5..1.0 window "
                        "(NIS_Config.h:226) — output follows the reference anyway")

                def nis_up(rgba, mask):
                    out = nvscaler_jax(rgba, out_w, out_h, nis_cfg)
                    fb_rgb = bilinear_fallback_fsr_jax(rgba[:3], out_w, out_h)
                    fb = jnp.concatenate(
                        [fb_rgb, jnp.ones((1, out_h, out_w), jnp.float32)], axis=0)
                    fb = fb * jnp.asarray(tint)[:, None, None]
                    return jnp.where(mask[None], out, fb)

                stages.append(("quantized_stage", jax.vmap(nis_up), mask_up))
            else:
                con = C.fsr_easu_con(w, h, w, h, out_w, out_h)

                def fsr_up(rgba, mask):
                    up = easu_jax(rgba[:3], out_w, out_h, con)
                    fb = bilinear_fallback_fsr_jax(rgba[:3], out_w, out_h)
                    rgb = jnp.where(mask[None], up, fb)
                    alpha = jnp.ones((1, out_h, out_w), jnp.float32)
                    return jnp.concatenate([rgb, alpha], axis=0)

                stages.append(("quantized_stage", jax.vmap(fsr_up), mask_up))

        if do_sh:
            sh_tile = fov.TILE_NIS_SHARPEN if cfg.use_nis else fov.TILE_FSR
            mask_sh = jnp.asarray(self._masks(out_w, out_h, sh_tile, eyes))
            if cfg.use_cas:
                from ..ops.cas import cas_sharpen_jax
                mcd = self.cas_max_color_delta

                def cas_sh(rgba, mask):
                    sh = cas_sharpen_jax(rgba[:3], cfg.sharpness, mcd)
                    fb = rgba * jnp.asarray(tint)[:, None, None]
                    rgb = jnp.where(mask[None], sh, fb[:3])
                    alpha = jnp.where(mask[None], jnp.float32(1.0), fb[3:4])
                    return jnp.concatenate([rgb, alpha], axis=0)

                stages.append(("quantized_stage", jax.vmap(cas_sh), mask_sh))
            elif cfg.use_nis:
                nis_cfg_sh = C.nvsharpen_update_config(
                    cfg.sharpness, out_w, out_h, out_w, out_h,
                    hdr_mode=self.hdr_mode)

                def nis_sh(rgba, mask):
                    out = nvsharpen_jax(rgba, nis_cfg_sh)
                    fb = jnp.concatenate(
                        [rgba[:3], jnp.ones((1, out_h, out_w), jnp.float32)], axis=0)
                    fb = fb * jnp.asarray(tint)[:, None, None]
                    return jnp.where(mask[None], out, fb)

                stages.append(("quantized_stage", jax.vmap(nis_sh), mask_sh))
            else:
                sharp = C.fsr_rcas_con(C.rcas_stops_from_slider(cfg.sharpness))

                def fsr_sh(rgba, mask):
                    sh = rcas_jax(rgba[:3], sharp)
                    fb = rgba * jnp.asarray(tint)[:, None, None]
                    rgb = jnp.where(mask[None], sh, fb[:3])
                    alpha = jnp.where(mask[None], jnp.float32(1.0), fb[3:4])
                    return jnp.concatenate([rgb, alpha], axis=0)

                stages.append(("quantized_stage", jax.vmap(fsr_sh), mask_sh))

        def run(frames):
            frames = jnp.asarray(frames)
            packed = frames.dtype == jnp.uint32   # packed-u32 API mode
            if packed:
                frames = jax.lax.bitcast_convert_type(frames, jnp.uint8)
            x = to_planar(frames, color_bits)
            for idx, (_, stage, mask) in enumerate(stages):
                x = stage(x, mask)
                if idx < len(stages) - 1:
                    # Intermediate UNORM texture round-trip (PostProcessor.cpp:527).
                    # Decode is multiply-by-reciprocal — the framework-wide UNORM
                    # convention (utils.frames.quantize_unorm / to_planar).
                    col = jnp.round(jnp.clip(x[:, :3], 0.0, 1.0) * cscale) * (
                        F32(1.0) / cscale)
                    alp = jnp.round(jnp.clip(x[:, 3:], 0.0, 1.0) * ascale) * (
                        F32(1.0) / ascale)
                    x = jnp.concatenate([col, alp], axis=1)
            out = from_planar(x, color_bits, alpha_bits)
            return (jax.lax.bitcast_convert_type(out, jnp.uint32)
                    if packed else out)

        return _jit_io(run)

    def _apply_bounds_layout(self, bounds):
        """The reference's per-Submit layout detection (PostProcessor.cpp:
        136-146): the first entry's VRTextureBounds_t decides single- vs
        double-wide packing; a switch recreates resources (Reset analog) and
        the timer's stereo scaling. Returns the first bounds (or None)."""
        if bounds is None:
            return None
        first_bounds = (bounds[0] if hasattr(bounds[0], "__len__")
                        else bounds)
        one_eye = self.bounds_contain_one_eye(first_bounds)
        if one_eye != self.single_eye_per_frame:
            self._log.info(
                "Texture bounds imply %s layout, recreating resources",
                "single-eye" if one_eye else "double-wide")
            self.single_eye_per_frame = one_eye
            self.timer = GpuTimer(scale_for_stereo=one_eye)
            self.reset()
        return first_bounds

    @staticmethod
    def bounds_contain_one_eye(bounds):
        """The reference's textureContainsOnlyOneEye detection
        (PostProcessor.cpp:146): |uMax - uMin| > 0.5 means the submitted
        bounds cover more than half the texture width, i.e. the texture
        holds a single eye; half-width bounds mean a double-wide shared
        texture. Evaluated in f32 like the C++."""
        u_min, _v_min, u_max, _v_max = (float(x) for x in bounds)
        return bool(abs(F32(u_max) - F32(u_min)) > F32(0.5))

    def crop_output(self, out, bounds):
        """Crop processed frames to the VRTextureBounds_t rectangle
        (headers/openvr.h:609-613), mapped to output pixels. The reference
        never crops — the compositor samples the submitted bounds from the
        full processed texture (VrHooks.cpp:54) — so this is the library-API
        equivalent of that sampling region. Flipped bounds (vMin > vMax,
        used by OpenGL-convention games) select the same rectangle."""
        u0, v0, u1, v1 = (float(x) for x in bounds)
        # packed-u32 outputs have no trailing channel dim: (..., H, W) u32
        packed = np.dtype(out.dtype) == np.uint32
        hax, wax = (-2, -1) if packed else (-3, -2)
        h, w = int(out.shape[hax]), int(out.shape[wax])
        x0, x1 = sorted((int(round(u0 * w)), int(round(u1 * w))))
        y0, y1 = sorted((int(round(v0 * h)), int(round(v1 * h))))
        x0, x1 = max(x0, 0), min(x1, w)
        y0, y1 = max(y0, 0), min(y1, h)
        if packed:
            return out[..., y0:y1, x0:x1]
        return out[..., y0:y1, x0:x1, :]

    def process(self, frames, eyes=None, bounds=None, crop=False):
        """frames: (B, H, W, 4) or (H, W, 4) uint8 (or uint16 for 10-bit),
          or — zero-copy packed mode — (B, H, W) / (H, W) uint32 holding
          bitcast RGBA8 texels (little-endian, R in the low byte); the
          result is then packed uint32 too and no u8<->u32 relayout runs.
        eyes: per-entry eye index (default alternating 0,1,...).
        bounds: optional VRTextureBounds_t (uMin, vMin, uMax, vMax), or a
          per-entry sequence of them. Like the reference (PostProcessor.cpp:
          146), the first entry's bounds decide the eye layout: half-width
          bounds switch the pipeline to double-wide packing (sticky until
          the next bounds say otherwise; switching drops compiled resources,
          the Reset() analog).
        crop: with bounds, return only the bounded region of the output
          (the compositor's sampling rectangle).
        Returns the processed frames at output resolution, same dtype."""
        if not self.config.enabled:
            return frames
        first_bounds = self._apply_bounds_layout(bounds)
        # zero-copy packed mode: uint32 frames are bitcast RGBA8 planes
        # (B, H, W) — the kernels consume/produce this layout natively, so
        # no u8<->u32 relayout happens anywhere (8-bit only)
        packed_in = (getattr(frames, "dtype", None) is not None
                     and np.dtype(frames.dtype) == np.uint32)
        if packed_in and self.color_bits != 8:
            raise ValueError("packed-u32 frames require color_bits=8")
        squeeze = hasattr(frames, "ndim") and frames.ndim == (
            2 if packed_in else 3)
        shape = frames.shape if not squeeze else (1,) + frames.shape
        b, h, w = shape[0], shape[1], shape[2]
        if eyes is None:
            eyes = tuple(i % 2 for i in range(b))
        else:
            eyes = tuple(int(e) for e in eyes)
        key = (b, h, w, str(frames.dtype), eyes, self.config, self.color_bits,
               self._resolve_backend(), self.precision, self.hdr_mode,
               self.cas_max_color_delta)
        fn = self._cache.get(key)
        if fn is None:
            self._log.info(
                "Creating post-processing resources: %dx%d -> %s (%s)",
                w, h, self.config.output_size(w, h),
                "CAS" if self.config.use_cas
                else ("NIS" if self.config.use_nis else "FSR"))
            fn = self._build(b, h, w, eyes)
            self._cache[key] = fn
        inp = frames[None] if squeeze else frames
        if self.config.debug_mode:
            # per-stereo-pair time: a batch of B single-eye frames covers
            # B/2 pairs (double-wide frames: one pair each)
            pairs = b / 2.0 if self.single_eye_per_frame else float(b)
            out = self.timer.measure(fn, inp, pairs=pairs)
        else:
            out = fn(inp)
        if self._capture_armed is not None:
            # Deferred capture (PostProcessor.cpp:634-637): the armed flag
            # saves the *next processed left-eye frame* and clears itself.
            # Double-wide frames contain the left eye, so any frame counts.
            idx = (0 if not self.single_eye_per_frame
                   else next((i for i, e in enumerate(eyes) if e == 0), None))
            if idx is not None:
                directory, formats = self._capture_armed
                self._capture_armed = None
                self.last_capture_paths = save_frame(
                    np.asarray(out[idx]), directory=directory,
                    use_nis=self.config.use_nis,
                    sharpness=self.config.sharpness,
                    radius=self.config.radius, formats=formats)
                self._log.info("Captured frame to %s",
                               [str(p) for p in self.last_capture_paths])
        if crop and first_bounds is not None:
            out = self.crop_output(out, first_bounds)
        return out[0] if squeeze else out

    def arm_capture(self, directory=".", formats=("dds",)):
        """Arm a deferred capture: the next `process` call that includes a
        left-eye (eye 0) frame saves its processed output with the
        reference filename scheme, then the flag clears — the semantics of
        the reference's takeCapture hotkey (PostProcessor.cpp:707 sets the
        flag, :634-637 saves on the next Eye_Left submit). Written paths
        land in `self.last_capture_paths`."""
        self._capture_armed = (directory, tuple(formats))


def upscale(frame, render_scale=None, sharpness=0.9, use_nis=False, radius=0.5,
            eye_centers=None, debug=False, eyes=None, color_bits=None,
            single_eye_per_frame=True, backend="auto", precision="full",
            bounds=None, crop=False, use_cas=False):
    """One-shot functional API.

    frame: (H, W, 4) or (B, H, W, 4) uint8 RGBA (uint16 for 10-bit).
    render_scale: <1 upscales by 1/rs; >1 supersamples by rs; 1/None = sharpen
    only. precision: "full" (oracle parity) or "half" (the packed-fp16
    analog). bounds: optional VRTextureBounds_t (uMin, vMin, uMax, vMax) —
    half-width bounds select double-wide eye packing (PostProcessor.cpp:146);
    with crop=True only the bounded output region is returned. use_cas
    selects FFX CAS (single CasFilter pass, ffx_cas.h). Other args mirror
    openvr_mod.cfg keys. Returns processed frame(s).
    """
    cfg = Config(enabled=True, use_nis=use_nis, use_cas=use_cas,
                 render_scale=1.0 if render_scale is None else float(render_scale),
                 sharpness=float(sharpness), radius=float(radius),
                 debug_mode=bool(debug))
    pipe = Pipeline(cfg, eye_centers=eye_centers,
                    single_eye_per_frame=single_eye_per_frame,
                    color_bits=color_bits, backend=backend,
                    precision=precision)
    return pipe.process(frame, eyes=eyes, bounds=bounds, crop=crop)

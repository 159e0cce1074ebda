"""NVIDIA Image Scaling on XLA (NVScaler + NVSharpen; SDR + both HDR modes).

Line-faithful port of src/nis/NIS_Scaler.h (see oracle/nis.py for the
shared-memory -> clamped-plane derivation). All source positions, filter
phases and lerp fractions depend only on static shapes and config, so they are
baked numpy constants; only image data flows through the graph.
"""

import jax.numpy as jnp
import numpy as np

from .common import F32, sat, hlsl_lerp
from .bilinear import bilinear_sample_jax
from ..core.constants import NisConfig
from ..core.nis_tables import COEF_SCALE, COEF_USM

__all__ = ["nvscaler_jax", "nvsharpen_jax", "get_y_jax", "get_y_linear_jax",
           "nis_source_maps", "KHDR_COMPRESSION"]

NIS_SCALE_FLOAT = F32(255.0)
KHDR_COMPRESSION = F32(0.282842712)  # kHDRCompressionFactor (NIS_Scaler.h:118)


def get_y_linear_jax(rgb):
    """getYLinear (NIS_Scaler.h:171-174) — BT.709 luma."""
    return (F32(0.2126) * rgb[0] + F32(0.7152) * rgb[1] + F32(0.0722) * rgb[2])


def get_y_jax(rgb, hdr_mode=0):
    """getY (NIS_Scaler.h:160-169): SDR BT.709; HDR linear =
    sqrt(luma)*kHDRCompressionFactor; HDR PQ = Rec.2020 luma weights."""
    if hdr_mode == 2:   # NIS_HDR_MODE_PQ
        return (F32(0.262) * rgb[0] + F32(0.678) * rgb[1]
                + F32(0.0593) * rgb[2])
    if hdr_mode == 1:   # NIS_HDR_MODE_LINEAR
        return jnp.sqrt(get_y_linear_jax(rgb)) * KHDR_COMPRESSION
    return get_y_linear_jax(rgb)


def _take2(plane, ys, xs):
    return jnp.take(jnp.take(plane, ys, axis=0), xs, axis=1)


def _edge_weights_jax(g_0, g_45, g_90, g_135, cfg):
    """GetEdgeMap weight logic (NIS_Scaler.h:187-292) on jnp arrays.
    Returns list [w0, w90, w45, w135]."""
    zero = jnp.zeros_like(g_0)
    one = F32(1.0)
    g090mx = jnp.maximum(g_0, g_90)
    g090mn = jnp.minimum(g_0, g_90)
    g45mx = jnp.maximum(g_45, g_135)
    g45mn = jnp.minimum(g_45, g_135)

    denom = g090mx + g45mx
    ratio = g090mx / denom
    nonzero = denom != 0
    e090 = jnp.where(nonzero, jnp.minimum(ratio, one), zero)
    e45 = jnp.where(nonzero, one - e090, zero)

    c1 = ((g090mx > g090mn * cfg.kDetectRatio)
          & (g090mx > cfg.kDetectThres) & (g090mx > g45mn))
    is0 = g090mx == g_0
    edge_0 = jnp.where(c1 & is0, one, zero)
    edge_90 = jnp.where(c1 & ~is0, one, zero)
    c2 = ((g45mx > g45mn * cfg.kDetectRatio)
          & (g45mx > cfg.kDetectThres) & (g45mx > g090mn))
    is45 = g45mx == g_45
    edge_45 = jnp.where(c2 & is45, one, zero)
    edge_135 = jnp.where(c2 & ~is45, one, zero)

    total = edge_0 + edge_90 + edge_45 + edge_135
    ge2 = total >= F32(2.0)
    ge1 = total >= F32(1.0)
    e0_is1 = edge_0 == one
    e45_is1 = edge_45 == one
    w0 = jnp.where(ge2, jnp.where(e0_is1, e090, zero), jnp.where(ge1, edge_0, zero))
    w90 = jnp.where(ge2, jnp.where(e0_is1, zero, e090), jnp.where(ge1, edge_90, zero))
    w45 = jnp.where(ge2, jnp.where(e45_is1, e45, zero), jnp.where(ge1, edge_45, zero))
    w135 = jnp.where(ge2, jnp.where(e45_is1, zero, e45), jnp.where(ge1, edge_135, zero))
    return [w0, w90, w45, w135]


def _edge_grads(p):
    """The four directional gradients from a {(i,j): plane} 3x3 dict, exact
    f32 summation order (NIS_Scaler.h:182-185)."""
    g_0 = jnp.abs(p[0, 0] + p[0, 1] + p[0, 2] - p[2, 0] - p[2, 1] - p[2, 2])
    g_45 = jnp.abs(p[1, 0] + p[0, 0] + p[0, 1] - p[2, 1] - p[2, 2] - p[1, 2])
    g_90 = jnp.abs(p[0, 0] + p[1, 0] + p[2, 0] - p[0, 2] - p[1, 2] - p[2, 2])
    g_135 = jnp.abs(p[1, 0] + p[2, 0] + p[2, 1] - p[0, 1] - p[0, 2] - p[1, 2])
    return g_0, g_45, g_90, g_135


def edge_map_plane_jax(y01, cfg):
    """Edge-map weights at every input pixel; returns list of 4 (H,W) planes."""
    h, w = y01.shape
    ys = np.arange(h)
    xs = np.arange(w)
    p = {(i, j): _take2(y01, np.clip(ys + i - 1, 0, h - 1), np.clip(xs + j - 1, 0, w - 1))
         for i in range(3) for j in range(3)}
    return _edge_weights_jax(*_edge_grads(p), cfg)


def _sat_dt(a, dt):
    """sat() that stays in dt (ops.common.sat's F32 scalars would silently
    promote bf16 operands back to f32 in the half-precision mode)."""
    return jnp.minimum(dt(1.0), jnp.maximum(dt(0.0), a))


def _div_dt(num, den, dt):
    """num / den. In bf16 mode the division evaluates in f32 (the VPU has no
    bf16 divide; mirrors ops.easu.easu_core routing rcp through f32)."""
    if dt is F32:
        return num / den
    return (num.astype(jnp.float32) / den.astype(jnp.float32)).astype(dt)


def _calc_lti_jax(p6, lo_mask, cfg, dt=F32):
    """CalcLTI; lo_mask: static bool array (phase <= 32)."""
    y = [jnp.where(lo_mask, p6[i], p6[i + 1]) for i in range(5)]
    a_min = jnp.minimum(jnp.minimum(y[0], y[1]), y[2])
    a_max = jnp.maximum(jnp.maximum(y[0], y[1]), y[2])
    b_min = jnp.minimum(jnp.minimum(y[2], y[3]), y[4])
    b_max = jnp.maximum(jnp.maximum(y[2], y[3]), y[4])
    a_cont = a_max - a_min
    b_cont = b_max - b_min
    cont_ratio = _div_dt(jnp.maximum(a_cont, b_cont),
                         jnp.minimum(a_cont, b_cont) + dt(cfg.kEps), dt)
    return (dt(1.0) - _sat_dt((cont_ratio - dt(cfg.kMinContrastRatio))
                              * dt(cfg.kRatioNorm), dt)) \
        * dt(cfg.kContrastBoost)


def _bake_coefs(table, phase_int):
    """Static-phase coefficient maps: 6 baked f32 arrays shaped like phase_int."""
    return [np.asarray(table[:, i].take(phase_int), np.float32) for i in range(6)]


def eval_poly6_core(pxl6, cs, cu, lo_mask, cfg, dt=F32):
    """EvalPoly6 (NIS_Scaler.h:399-434) with explicit coefficient arrays —
    cs/cu: 6 scale/USM coefficient planes (static or traced), lo_mask:
    phase <= 32 (the CalcLTI tap-window select). Shared by the XLA op and
    the Pallas NVScaler kernel. dt=bfloat16 is the NIS_USE_HALF_PRECISION
    analog (NIS_Scaler.h:141-148): relaxed elementwise math, divisions via
    f32."""
    y = cs[0] * pxl6[0]
    for i in range(1, 6):
        y = y + cs[i] * pxl6[i]
    y_usm = cu[0] * pxl6[0]
    for i in range(1, 6):
        y_usm = y_usm + cu[i] * pxl6[i]
    y_scale = dt(1.0) - _sat_dt((y * dt(1.0 / 255) - dt(cfg.kSharpStartY))
                                * dt(cfg.kSharpScaleY), dt)
    y_sharpness = y_scale * dt(cfg.kSharpStrengthScale) + dt(cfg.kSharpStrengthMin)
    y_usm = y_usm * y_sharpness
    y_limit = (y_scale * dt(cfg.kSharpLimitScale) + dt(cfg.kSharpLimitMin)) * y
    y_usm = jnp.minimum(y_limit, jnp.maximum(-y_limit, y_usm))
    y_usm = y_usm * _calc_lti_jax(pxl6, lo_mask, cfg, dt)
    return y + y_usm


def _eval_poly6_jax(pxl6, phase_int, cfg):
    cs = _bake_coefs(COEF_SCALE, phase_int)
    cu = _bake_coefs(COEF_USM, phase_int)
    return eval_poly6_core(pxl6, cs, cu, phase_int <= 32, cfg)


def nis_source_maps(out_w, out_h, cfg):
    """Static per-axis source maps: srcX=(0.5+dst)*kScale-0.5 (NIS_Scaler.h:682)."""
    dstx = np.arange(out_w, dtype=np.float32)
    dsty = np.arange(out_h, dtype=np.float32)
    src_x = (F32(0.5) + dstx) * cfg.kScaleX - F32(0.5)
    src_y = (F32(0.5) + dsty) * cfg.kScaleY - F32(0.5)
    px = np.floor(src_x)
    py = np.floor(src_y)
    return (px.astype(np.int64), py.astype(np.int64),
            (src_x - px).astype(np.float32), (src_y - py).astype(np.float32))


def nvscaler_jax(rgba, out_w, out_h, cfg: NisConfig, rows=None, cols=None,
                 emap=None):
    """rgba: (4, H, W) f32 in [0,1]. Returns (4, out_h, out_w) f32.

    rows/cols: optional numpy index arrays selecting a sub-grid of output
    pixels (used to patch the Pallas kernel's border rows exactly).
    emap: optional precomputed edge_map_plane_jax(y01) (shared across
    sub-grid calls)."""
    _, h, w = rgba.shape
    y01 = get_y_jax(rgba, cfg.hdr_mode)
    ys255 = y01 * NIS_SCALE_FLOAT
    if emap is None:
        emap = edge_map_plane_jax(y01, cfg)

    pxi, pyi, fx1d, fy1d = nis_source_maps(out_w, out_h, cfg)
    u_full = (np.arange(out_w, dtype=np.float32) + F32(0.5)) * cfg.kDstNormX
    v_full = (np.arange(out_h, dtype=np.float32) + F32(0.5)) * cfg.kDstNormY
    if rows is not None:
        pyi, fy1d, v_full = pyi[rows], fy1d[rows], v_full[rows]
        out_h = len(rows)
    if cols is not None:
        pxi, fx1d, u_full = pxi[cols], fx1d[cols], u_full[cols]
        out_w = len(cols)
    fx = fx1d[None, :]                       # (1, Wo) static numpy
    fy = fy1d[:, None]                       # (Ho, 1)
    fx_int = (fx1d * F32(64)).astype(np.int32)
    fy_int = (fy1d * F32(64)).astype(np.int32)

    p = [[_take2(ys255, np.clip(pyi + i - 2, 0, h - 1), np.clip(pxi + j - 2, 0, w - 1))
          for j in range(6)] for i in range(6)]

    # FilterNormal with per-axis static coefficient maps (NIS_Scaler.h:436-453)
    cy = _bake_coefs(COEF_SCALE, fy_int)     # 6 x (Ho,)
    cx = _bake_coefs(COEF_SCALE, fx_int)     # 6 x (Wo,)
    pixel_n = None
    for j in range(6):
        v_acc = p[0][j] * cy[0][:, None]
        for i in range(1, 6):
            v_acc = v_acc + p[i][j] * cy[i][:, None]
        term = v_acc * cx[j][None, :]
        pixel_n = term if pixel_n is None else pixel_n + term

    # GetDirFilters (NIS_Scaler.h:455-583); phases/fractions are static.
    fy_int2d = np.broadcast_to(fy_int[:, None], (out_h, out_w))
    fx_int2d = np.broadcast_to(fx_int[None, :], (out_h, out_w))
    interp0 = [hlsl_lerp(p[i][2], p[i][3], fx) for i in range(6)]
    f0 = _eval_poly6_jax(interp0, fy_int2d, cfg)
    interp90 = [hlsl_lerp(p[2][i], p[3][i], fy) for i in range(6)]
    f90 = _eval_poly6_jax(interp90, fx_int2d, cfg)

    b45 = F32(0.5) + F32(0.5) * (fx - fy)    # static (Ho,Wo)
    t45 = [None] * 7
    t45[1] = hlsl_lerp(p[2][1], p[1][2], b45)
    t45[3] = hlsl_lerp(p[3][2], p[2][3], b45)
    t45[5] = hlsl_lerp(p[4][3], p[3][4], b45)
    hi = b45 >= F32(0.5)
    b45p = np.where(hi, b45 - F32(0.5), F32(0.5) - b45).astype(np.float32)
    t45[0] = jnp.where(hi, hlsl_lerp(p[1][1], p[0][2], b45p), hlsl_lerp(p[1][1], p[2][0], b45p))
    t45[2] = jnp.where(hi, hlsl_lerp(p[2][2], p[1][3], b45p), hlsl_lerp(p[2][2], p[3][1], b45p))
    t45[4] = jnp.where(hi, hlsl_lerp(p[3][3], p[2][4], b45p), hlsl_lerp(p[3][3], p[4][2], b45p))
    t45[6] = jnp.where(hi, hlsl_lerp(p[4][4], p[3][5], b45p), hlsl_lerp(p[4][4], p[5][3], b45p))
    p45 = (fx + fy).astype(np.float32)
    wrap = p45 >= F32(1.0)
    interp45 = [jnp.where(wrap, t45[i + 1], t45[i]) for i in range(6)]
    p45 = np.where(wrap, p45 - F32(1.0), p45).astype(np.float32)
    f45 = _eval_poly6_jax(interp45, (p45 * F32(64)).astype(np.int32), cfg)

    b135 = (F32(0.5) * (fx + fy)).astype(np.float32)
    t135 = [None] * 7
    t135[1] = hlsl_lerp(p[3][1], p[4][2], b135)
    t135[3] = hlsl_lerp(p[2][2], p[3][3], b135)
    t135[5] = hlsl_lerp(p[1][3], p[2][4], b135)
    hi = b135 >= F32(0.5)
    b135p = np.where(hi, b135 - F32(0.5), F32(0.5) - b135).astype(np.float32)
    t135[0] = jnp.where(hi, hlsl_lerp(p[4][1], p[5][2], b135p), hlsl_lerp(p[4][1], p[3][0], b135p))
    t135[2] = jnp.where(hi, hlsl_lerp(p[3][2], p[4][3], b135p), hlsl_lerp(p[3][2], p[2][1], b135p))
    t135[4] = jnp.where(hi, hlsl_lerp(p[2][3], p[3][4], b135p), hlsl_lerp(p[2][3], p[1][2], b135p))
    t135[6] = jnp.where(hi, hlsl_lerp(p[1][4], p[2][5], b135p), hlsl_lerp(p[1][4], p[0][3], b135p))
    p135 = (F32(1.0) + (fx - fy)).astype(np.float32)
    wrap = p135 >= F32(1.0)
    interp135 = [jnp.where(wrap, t135[i + 1], t135[i]) for i in range(6)]
    p135 = np.where(wrap, p135 - F32(1.0), p135).astype(np.float32)
    f135 = _eval_poly6_jax(interp135, (p135 * F32(64)).astype(np.int32), cfg)

    # 2x2 edge maps at floor(src)+{0,1} interpolated by (fx, fy), * 255.
    ws = []
    for k in range(4):
        e = [[_take2(emap[k], np.clip(pyi + i, 0, h - 1), np.clip(pxi + j, 0, w - 1))
              for j in range(2)] for i in range(2)]
        h0 = hlsl_lerp(e[0][0], e[0][1], fx)
        h1 = hlsl_lerp(e[1][0], e[1][1], fx)
        ws.append(hlsl_lerp(h0, h1, fy) * F32(255))

    op_y = (f0 * ws[0] + f90 * ws[1] + f45 * ws[2] + f135 * ws[3]
            + pixel_n * (NIS_SCALE_FLOAT - ws[0] - ws[1] - ws[2] - ws[3])
            ) * F32(1.0 / 255.0)

    op = bilinear_sample_jax(rgba, u_full, v_full)
    if cfg.hdr_mode == 1:   # NIS_HDR_MODE_LINEAR: multiplicative luma fix
        # (NIS_Scaler.h:749-756)
        k_eps = F32(1e-4)
        k_norm = np.divide(F32(1.0), NIS_SCALE_FLOAT * KHDR_COMPRESSION,
                           dtype=np.float32)
        op_yn = jnp.maximum(op_y, F32(0.0)) * k_norm
        corr = (op_yn * op_yn + k_eps) / (
            jnp.maximum(get_y_linear_jax(op), F32(0.0)) + k_eps)
        return jnp.concatenate([op[:3] * corr[None], op[3:4]], axis=0)
    # SDR and PQ: additive luma correction (:758-761)
    corr = op_y * F32(1.0 / 255.0) - get_y_jax(op, cfg.hdr_mode)
    return jnp.concatenate([op[:3] + corr[None], op[3:4]], axis=0)


def _calc_lti_fast_jax(y5, cfg, dt=F32):
    a_min = jnp.minimum(jnp.minimum(y5[0], y5[1]), y5[2])
    a_max = jnp.maximum(jnp.maximum(y5[0], y5[1]), y5[2])
    b_min = jnp.minimum(jnp.minimum(y5[2], y5[3]), y5[4])
    b_max = jnp.maximum(jnp.maximum(y5[2], y5[3]), y5[4])
    a_cont = a_max - a_min
    b_cont = b_max - b_min
    cont_ratio = _div_dt(
        jnp.maximum(a_cont, b_cont),
        jnp.minimum(a_cont, b_cont) + dt(cfg.kEps * F32(1.0 / 255.0)), dt)
    return (dt(1.0) - _sat_dt((cont_ratio - dt(cfg.kMinContrastRatio))
                              * dt(cfg.kRatioNorm), dt)) \
        * dt(cfg.kContrastBoost)


def _eval_usm_jax(pxl5, strength, limit, cfg, dt=F32):
    y_usm = dt(-0.6001) * pxl5[1] + dt(1.2002) * pxl5[2] - dt(0.6001) * pxl5[3]
    y_usm = y_usm * strength
    y_usm = jnp.minimum(limit, jnp.maximum(-limit, y_usm))
    return y_usm * _calc_lti_fast_jax(pxl5, cfg, dt)


def nvsharpen_jax(rgba, cfg: NisConfig):
    """rgba: (4, H, W) f32 in [0,1]. Returns (4, H, W) f32."""
    _, h, w = rgba.shape
    y01 = get_y_jax(rgba, cfg.hdr_mode)
    ys = np.arange(h)
    xs = np.arange(w)
    p = [[_take2(y01, np.clip(ys + i - 2, 0, h - 1), np.clip(xs + j - 2, 0, w - 1))
          for j in range(5)] for i in range(5)]

    scale_y = F32(1.0) - sat((p[2][2] - cfg.kSharpStartY) * cfg.kSharpScaleY)
    strength = scale_y * cfg.kSharpStrengthScale + cfg.kSharpStrengthMin
    limit = (scale_y * cfg.kSharpLimitScale + cfg.kSharpLimitMin) * p[2][2]

    half = F32(0.5)
    d0 = _eval_usm_jax([p[i][2] for i in range(5)], strength, limit, cfg)
    d90 = _eval_usm_jax([p[2][i] for i in range(5)], strength, limit, cfg)
    d45 = _eval_usm_jax(
        [p[1][1], hlsl_lerp(p[2][1], p[1][2], half), p[2][2],
         hlsl_lerp(p[3][2], p[2][3], half), p[3][3]], strength, limit, cfg)
    d135 = _eval_usm_jax(
        [p[3][1], hlsl_lerp(p[3][2], p[2][1], half), p[2][2],
         hlsl_lerp(p[2][3], p[1][2], half), p[1][3]], strength, limit, cfg)

    pc = {(i, j): p[i + 1][j + 1] for i in range(3) for j in range(3)}
    wgt = _edge_weights_jax(*_edge_grads(pc), cfg)
    usm_y = d0 * wgt[0] + d90 * wgt[1] + d45 * wgt[2] + d135 * wgt[3]
    if cfg.hdr_mode == 1:   # NIS_HDR_MODE_LINEAR (NIS_Scaler.h:951-959)
        k_eps = F32(1e-4) * KHDR_COMPRESSION * KHDR_COMPRESSION
        new_y = jnp.maximum(p[2][2] + usm_y, F32(0.0))
        old_y = p[2][2]
        corr = (new_y * new_y + k_eps) / (old_y * old_y + k_eps)
        return jnp.concatenate([rgba[:3] * corr[None], rgba[3:4]], axis=0)
    return jnp.concatenate([rgba[:3] + usm_y[None], rgba[3:4]], axis=0)

"""NumPy oracle for FFX CAS sharpen-only (the vestigial third kernel).

Port of CasSetup + CasFilter(noScaling=true) from reference
src/cas/ffx_cas.h:375-395, 430-552 with the build flags the fork's old CAS
releases shipped (src/cas/cas.sharpen.hlsl:1-2): CAS_SHARPEN_ONLY=1,
CAS_BETTER_DIAGONALS=1, fast approximations (no CAS_GO_SLOWER), green-coef
weights (no CAS_SLOW). CasLoad is Texture2D.Load, so out-of-bounds taps read
zero (cas.compute.h:14-16); CasInput is identity (no linearization) and the
wrapper stores float4(rgb, 1) (cas.compute.h:36-48). The current reference
build omits CAS (absent from src/CMakeLists.txt:58-90) — its sharpen-only
config maps to renderScale 1.0 + RCAS — so this exists for parity with the
older releases README.md:135 cites.
"""

import numpy as np

from .intrinsics import (F32, f32, rcp, sat, lerp, min3, max3,
                         aprx_lo_rcp, aprx_lo_sqrt, aprx_med_rcp, clamp)

__all__ = ["cas_setup", "cas_sharpen_oracle"]


def cas_setup(sharpness):
    """CasSetup sharpness term (ffx_cas.h:391): -1/lerp(8, 5, sat(s))."""
    return -rcp(lerp(F32(8.0), F32(5.0), sat(f32(sharpness))))


def cas_sharpen_oracle(img, sharpness, max_color_delta=1.0):
    """img: (H, W, 3) f32 in [0,1]. Returns the sharpened (H, W, 3) f32."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    sharp = cas_setup(sharpness)
    mcd = f32(max_color_delta)

    pad = np.zeros((h + 2, w + 2, 3), np.float32)  # Load() OOB -> zero
    pad[1:-1, 1:-1] = img

    def tap(dy, dx):
        return pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]

    a, b, c = tap(-1, -1), tap(-1, 0), tap(-1, 1)
    d, e, f = tap(0, -1), tap(0, 0), tap(0, 1)
    g, hh, i = tap(1, -1), tap(1, 0), tap(1, 1)

    mn = np.minimum(min3(d, e, f), np.minimum(b, hh))
    mn2 = np.minimum(min3(mn, a, c), np.minimum(g, i))
    mn = mn + mn2                                   # CAS_BETTER_DIAGONALS
    mx = np.maximum(max3(d, e, f), np.maximum(b, hh))
    mx2 = np.maximum(max3(mx, a, c), np.maximum(g, i))
    mx = mx + mx2

    rcp_m = aprx_lo_rcp(mx)
    amp = sat(np.minimum(mn, F32(2.0) - mx) * rcp_m)
    amp = aprx_lo_sqrt(amp)
    wgt = amp * sharp                               # per-channel, then green
    w_g = wgt[..., 1:2]                             # green coef only
    rcp_weight = aprx_med_rcp(F32(1.0) + F32(4.0) * w_g)
    pix = sat((b * w_g + d * w_g + f * w_g + hh * w_g + e) * rcp_weight)
    return clamp(pix, e - mcd, e + mcd)

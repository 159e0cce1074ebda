"""Host-side "derived rows" analysis shared by the band-pipeline kernels.

The idea (first shipped in kernels/fsr.py v3): all row-gather targets of an
upscaling kernel are monotone non-decreasing maps with steps <= 1 (output
rows advance at most one input row at a time when out >= in). Every tap
block b — e.g. clip(pyi[r] + dy) for the NIS 6x6 support
(NIS_Scaler.h:600-608), the bilinear y0/y1 rows, the edge-map clamp
compositions — is then *derivable* from ONE extended gather
E[j] = X[ext_map[j]]: for each output row t there is a shift o with
ext_map[t + o] == target_b[t], and across a whole band only two distinct
shifts occur. So instead of gathering N blocks x TH rows with one-hot
matmuls, the kernel gathers TPX ~ TH + window rows once per operand plane
and materializes each block as two static sublane slices + one per-row
select — host-verified here per build, with a full-gather fallback when the
structure does not hold (e.g. downscaling configs outside the NIS validity
window, NIS_Config.h:226).
"""

import numpy as np

__all__ = ["find_block_shifts", "derive_plan"]


def find_block_shifts(ext_map, target, live=None, max_probe=None):
    """Find (o1, o2, mask) with ext_map[t + o1|o2] == target[t] for all live t.

    ext_map: (EXT,) int — source row of each extended-gather position.
    target: (T,) int — the block's source row per output row.
    live: optional (T,) bool — rows that must match (others are don't-care).
    Returns (o1, o2, mask) with mask[t] True -> use o1; or None if no two
    shifts cover every live row.
    """
    ext_map = np.asarray(ext_map)
    target = np.asarray(target)
    T = len(target)
    EXT = len(ext_map)
    if live is None:
        live = np.ones(T, bool)
    nmax = EXT - T + 1
    if nmax <= 0:
        return None
    if max_probe is not None:
        nmax = min(nmax, max_probe)
    matches = [(ext_map[o:o + T] == target) for o in range(nmax)]
    # pick o1 = offset covering the most live rows, o2 = best on the rest
    cov = [int((m & live).sum()) for m in matches]
    o1 = int(np.argmax(cov))
    m1 = matches[o1]
    rest = live & ~m1
    if not rest.any():
        return o1, o1, m1 | ~live
    cov2 = [int((m & rest).sum()) for m in matches]
    o2 = int(np.argmax(cov2))
    if ((m1 | matches[o2]) | ~live).all():
        return o1, o2, m1 | ~live
    return None


def derive_plan(ext_maps, targets_per_band, live=None):
    """Band-uniform derivation plan for a stack of blocks.

    ext_maps: (GY, EXT) int — per-band extended maps.
    targets_per_band: list over blocks of (GY, T) int arrays.
    Returns (ok, offsets, masks): offsets is a list of (o1, o2) per block
    (shared by every band — the kernel's slices must be static), masks is
    (GY, n_blocks, T, 1) f32 with 1 -> slice at o1. ok is False when any
    block/band pair cannot be covered by two band-uniform shifts.
    """
    GY = len(ext_maps)
    n_blocks = len(targets_per_band)
    T = targets_per_band[0].shape[1]
    masks = np.zeros((GY, n_blocks, T, 1), np.float32)
    offsets = []
    for bi, tg in enumerate(targets_per_band):
        # find candidate shift pairs on band GY//2 (interior), then verify
        # they hold everywhere
        probe = find_block_shifts(ext_maps[GY // 2], tg[GY // 2], live)
        if probe is None:
            return False, None, None
        o1, o2, _ = probe
        for g in range(GY):
            em = ext_maps[g]
            m1 = em[o1:o1 + T] == tg[g]
            m2 = em[o2:o2 + T] == tg[g]
            lv = np.ones(T, bool) if live is None else live
            if not ((m1 | m2) | ~lv).all():
                return False, None, None
            masks[g, bi, :, 0] = m1 | ~lv
        offsets.append((o1, o2))
    return True, offsets, masks

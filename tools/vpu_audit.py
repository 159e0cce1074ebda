"""Compute-floor audit for the hot kernels' stage math (VERDICT r4 #1/#4).

build_dma_floor bounds the kernels' memory traffic; this tool bounds their
*math*. It (a) counts each stage's elementwise ops / dot MACs exactly by
walking the jaxpr at the kernel's working shapes, (b) measures this chip's
sustained in-kernel VPU elementwise rate and MXU matmul rate with
kernels/sol.build_vpu_rate / build_mxu_rate — whose own op/MAC counts are
measured by the SAME jaxpr meters, so counting bias cancels — and
(c) times the stage math on-chip as (full kernel) - (ablated kernel) at
radius 2.0 (every chunk inside the circle, so the math runs on every
plane). The ratio predicted/measured is the stage's distance from the
chip's compute speed-of-light:

    efficiency = (ops / rate) / measured_math_time     (1.0 = at floor)

Rate probes are slope-based (two chain lengths k, rate = d(work)/d(time))
so launch/DMA/store overhead cancels; because the tunnel chip's rate
drifts within a session, each slope is taken over INTERLEAVED lo/hi
timing pairs and the median of the per-pair slopes is used (a lone
too-small delta would otherwise fabricate an impossible rate — the r05
session's first cut measured "625 TMAC/s" that way, 3x the v5e datasheet).
Every published rate ships with its per-pair slopes so the spread is
visible in the artifact.

Reference analog: the EASU/RCAS pixel math this audits is FsrEasuF +
FsrRcasF (src/fsr/ffx_fsr1.h:315-437, 684-769) and the NVScaler filter
stack (src/nis/NIS_Scaler.h:589-770), whose GPU cost the reference bounds
by texture bandwidth (PostProcessor.cpp:619-626); on a TPU the same math
is VPU/MXU-bound, so the honest bound is ops x measured rate.

Usage:
  python tools/vpu_audit.py [--out VPU_AUDIT.json] [--quick]    # fused FSR
  python tools/vpu_audit.py --nis [--out NIS_AUDIT.json]        # NVScaler
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ELEMWISE_SKIP = {"broadcast_in_dim", "convert_element_type", "reshape",
                 "squeeze", "slice", "concatenate", "transpose", "iota",
                 "stop_gradient", "copy"}


def count_ops(fn, args):
    """Total elementwise ops of fn(args), in full-output-plane units.

    Walks the jaxpr, crediting each elementwise primitive with its output
    element count (broadcasts/converts/layout ops excluded — Mosaic folds
    them into the consuming op's operand access).
    """
    import jax

    jx = jax.make_jaxpr(fn)(args)
    total = [0]

    def walk(jaxpr):
        for eq in jaxpr.eqns:
            if eq.primitive.name in ("pjit", "closed_call", "custom_jvp_call",
                                     "custom_vjp_call", "jit"):
                inner = eq.params.get("jaxpr")
                if inner is not None:
                    walk(getattr(inner, "jaxpr", inner))
                continue
            for p in eq.params.values():
                if hasattr(p, "jaxpr"):
                    walk(p.jaxpr)
            if eq.primitive.name in ELEMWISE_SKIP:
                continue
            sz = max((int(np.prod(v.aval.shape)) for v in eq.outvars
                      if hasattr(v.aval, "shape")), default=0)
            total[0] += sz

    walk(jx.jaxpr)
    return total[0]


def _dot_macs(eq):
    (lc, rc), (lb, rb) = eq.params["dimension_numbers"]
    a, b = eq.invars[0].aval, eq.invars[1].aval
    bsz = int(np.prod([a.shape[i] for i in lb])) if lb else 1
    ksz = int(np.prod([a.shape[i] for i in lc]))
    m = int(np.prod([s for i, s in enumerate(a.shape)
                     if i not in lc and i not in lb]))
    n = int(np.prod([s for i, s in enumerate(b.shape)
                     if i not in rc and i not in rb]))
    return bsz * m * ksz * n


def _walk_grid(jaxpr, visit):
    """Sum visit(eq) over a jaxpr, descending into pallas_call bodies
    (x grid size) and cond branches (max over branches — at the audit's
    radius 2.0 every band takes the all-inside branch, which is also the
    work-max one)."""
    total = 0
    for eq in jaxpr.eqns:
        name = eq.primitive.name
        if name == "pallas_call":
            gm = eq.params["grid_mapping"]
            g = int(np.prod([int(x) for x in gm.grid])) if gm.grid else 1
            body = eq.params["jaxpr"]
            total += g * _walk_grid(getattr(body, "jaxpr", body), visit)
        elif name == "cond":
            total += max(_walk_grid(getattr(b, "jaxpr", b), visit)
                         for b in eq.params["branches"])
        else:
            total += visit(eq)
            for v in eq.params.values():
                for x in (v if isinstance(v, (tuple, list)) else [v]):
                    if hasattr(x, "jaxpr"):
                        total += _walk_grid(x.jaxpr, visit)
                    elif hasattr(x, "eqns"):
                        total += _walk_grid(x, visit)
    return total


def count_macs(fn, args):
    """Total dot_general MACs of fn(args), grid/cond-aware."""
    import jax

    def visit(eq):
        return _dot_macs(eq) if eq.primitive.name == "dot_general" else 0

    return _walk_grid(jax.make_jaxpr(fn)(args).jaxpr, visit)


def count_ops_grid(fn, args):
    """Total elementwise ops of fn(args), grid/cond-aware (the whole-kernel
    analog of count_ops: use deltas between kernel variants so the shared
    index/DMA machinery cancels)."""
    import jax

    def visit(eq):
        if eq.primitive.name in ELEMWISE_SKIP or \
                eq.primitive.name == "dot_general":
            return 0
        return max((int(np.prod(v.aval.shape)) for v in eq.outvars
                    if hasattr(v.aval, "shape")), default=0)

    return _walk_grid(jax.make_jaxpr(fn)(args).jaxpr, visit)


def paired_slope(t_lo, t_hi, d_work, pairs=4):
    """Median slope rate from interleaved lo/hi timing pairs.

    t_lo / t_hi: callables returning one timing in ms. Interleaving makes
    each pair share the chip's instantaneous rate, so session drift cancels
    per pair; the median over pairs rejects one-off spikes. Returns
    (rate_per_s, [per-pair rates]).
    """
    slopes = []
    for _ in range(pairs):
        a = t_lo()
        b = t_hi()
        dt = (b - a) * 1e-3
        slopes.append(d_work / dt if dt > 0 else float("nan"))
    good = [s for s in slopes if np.isfinite(s) and s > 0]
    rate = statistics.median(good) if good else float("nan")
    return rate, slopes


def main():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu.core import constants as C
    from openvr_fsr_tpu.kernels import fsr as KF
    from openvr_fsr_tpu.kernels import sol
    from openvr_fsr_tpu.ops.easu import easu_core_split, TAP_ORDER
    from openvr_fsr_tpu.ops.rcas import rcas_core

    quick = "--quick" in sys.argv
    nis_mode = "--nis" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    h_in, w_in = 1869, 1683
    out_w, out_h = 2244, 2492
    B = 2
    TH, TH_E, CHUNK = 128, 130, 128
    GY = -(-out_h // TH)
    NCHUNK = -(-out_w // CHUNK)
    OWP = NCHUNK * CHUNK

    # ---- (a) op counts at working shapes ---------------------------------
    def z(*shape):
        return jnp.zeros(shape, jnp.float32)

    n_taps = len(set(TAP_ORDER))

    def stage1_math(args):
        taps, i = {}, 0
        for od in sorted(set(TAP_ORDER)):
            taps[od] = [args[i], args[i + 1], args[i + 2]]
            i += 3
        return easu_core_split(taps, args[i], args[i + 1], exact_div=True)

    s1_args = ([z(TH_E, CHUNK)] * (3 * n_taps)
               + [z(1, CHUNK), z(TH_E, 1)])
    ops_core = count_ops(stage1_math, s1_args) / (TH_E * CHUNK)
    # the inv_cmax tap-extraction muls (kernels/fsr._easu_vals) belong to
    # stage-1 math too: 36 plane muls
    ops_core += 3 * len(TAP_ORDER)

    def onefma_math(args):
        acc = [args[0], args[1], args[2]]
        for t in range(1, len(TAP_ORDER)):
            for c in range(3):
                acc[c] = acc[c] + args[3 * t + c]
        return [a * np.float32(1 / 12) for a in acc]

    ops_1fma = (count_ops(onefma_math, [z(TH_E, CHUNK)] * 36)
                / (TH_E * CHUNK)) + 3 * len(TAP_ORDER)

    sharp_lin = C.fsr_rcas_con(C.rcas_stops_from_slider(0.9))

    def rcas_math(args):
        return rcas_core(*args, sharp_lin)

    r_args = [z(3, TH, OWP)] * 5
    ops_rcas = count_ops(rcas_math, r_args) / (TH * OWP)

    def move_math(args):
        return (((args[0] + args[1]) + (args[2] + args[3]))
                + args[4]) * np.float32(0.2)

    ops_move = count_ops(move_math, r_args) / (TH * OWP)

    def cycle_math(args):
        return sol.vpu_cycle(args[:8], args[8])

    ops_cycle = count_ops(cycle_math, [z(TH_E, CHUNK)] * 9) / (TH_E * CHUNK)

    print(f"op counts/elem: core={ops_core:.1f} one_fma={ops_1fma:.1f} "
          f"rcas={ops_rcas:.1f} move={ops_move:.1f} cycle={ops_cycle:.1f}",
          flush=True)

    # ---- (b) chip VPU + MXU rates (interleaved paired slopes) -------------
    on_tpu = jax.default_backend() == "tpu"
    seed = jnp.asarray(
        np.random.default_rng(0).random((TH_E, CHUNK), np.float32))

    def t_ms(fn, arg_tuple, iters=20):
        y = fn(*arg_tuple)
        _ = np.asarray(y[0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*arg_tuple)
        _ = np.asarray(y[0, 0])
        return (time.perf_counter() - t0) / iters * 1e3

    # Heavy hi-k so the compute delta dominates dispatch noise: at the
    # ~5 Tops/s true VPU rate (post anti-DCE fix) the hi call is ~17 ms
    # against ~4 ms of tunnel/launch wall, so the slope is ~4:1 signal.
    ks = (8, 48) if quick else (16, 144)
    steps = 64 if quick else 1024
    f_lo = jax.jit(sol.build_vpu_rate(ks[0], steps=steps,
                                      interpret=not on_tpu))
    f_hi = jax.jit(sol.build_vpu_rate(ks[1], steps=steps,
                                      interpret=not on_tpu))
    d_ops = (ks[1] - ks[0]) * ops_cycle * TH_E * CHUNK * steps
    rate, vpu_slopes = paired_slope(lambda: t_ms(f_lo, (seed,)),
                                    lambda: t_ms(f_hi, (seed,)), d_ops)
    print(f"vpu rate: {rate / 1e12:.2f} Tops/s, per-pair "
          f"{[round(s / 1e12, 2) for s in vpu_slopes]}", flush=True)

    mxu_seed = jnp.asarray(
        np.random.default_rng(1).random((128, 128), np.float32))
    mxu_w = jnp.asarray(
        np.random.default_rng(2).random((128, 128), np.float32) * 0.1)
    mks = (4, 24) if quick else (8, 64)
    msteps = 64 if quick else 128
    p_lo = sol.build_mxu_rate(mks[0], steps=msteps, interpret=not on_tpu)
    p_hi = sol.build_mxu_rate(mks[1], steps=msteps, interpret=not on_tpu)
    m_lo = count_macs(lambda xw: p_lo(*xw), (mxu_seed, mxu_w))
    m_hi = count_macs(lambda xw: p_hi(*xw), (mxu_seed, mxu_w))
    j_lo, j_hi = jax.jit(p_lo), jax.jit(p_hi)
    mxu_rate, mxu_slopes = paired_slope(
        lambda: t_ms(j_lo, (mxu_seed, mxu_w)),
        lambda: t_ms(j_hi, (mxu_seed, mxu_w)), m_hi - m_lo)
    print(f"mxu rate: {mxu_rate / 1e12:.2f} TMAC/s, per-pair "
          f"{[round(s / 1e12, 2) for s in mxu_slopes]}", flush=True)

    vks = (8, 48) if quick else (16, 112)
    vsteps = 64 if quick else 1024
    v_lo = jax.jit(sol.build_vmem_rate(vks[0], steps=vsteps,
                                       interpret=not on_tpu))
    v_hi = jax.jit(sol.build_vmem_rate(vks[1], steps=vsteps,
                                       interpret=not on_tpu))
    x_lo = jnp.asarray(np.random.default_rng(3).random(
        (vks[0], TH_E, CHUNK), np.float32))
    x_hi = jnp.asarray(np.random.default_rng(4).random(
        (vks[1], TH_E, CHUNK), np.float32))
    d_bytes = (vks[1] - vks[0]) * TH_E * CHUNK * 4 * vsteps
    vmem_rate, vmem_slopes = paired_slope(lambda: t_ms(v_lo, (x_lo,)),
                                          lambda: t_ms(v_hi, (x_hi,)),
                                          d_bytes)
    # round(x) with no ndigits coerces to int and raises on NaN pairs
    # (dt<=0 under timing drift), so keep NaN-safe.
    def _gbs(s):
        return round(s / 1e9) if np.isfinite(s) else None

    print(f"vmem plane-load rate: {vmem_rate / 1e9:.0f} GB/s, per-pair "
          f"{[_gbs(s) for s in vmem_slopes]}", flush=True)

    def _t(s):  # NaN-safe (NaN is invalid JSON; a dropped pair becomes null)
        return round(s / 1e12, 2) if np.isfinite(s) else None

    rate_meta = {
        "vpu_rate_tops": round(rate / 1e12, 3),
        "vpu_pair_slopes_tops": [_t(s) for s in vpu_slopes],
        "mxu_rate_tmacs": round(mxu_rate / 1e12, 3),
        "mxu_pair_slopes_tmacs": [_t(s) for s in mxu_slopes],
        "vmem_load_gbs": round(vmem_rate / 1e9, 1),
        "vmem_pair_slopes_gbs": [_gbs(s) for s in vmem_slopes],
        "rate_method": "median of interleaved lo/hi paired slopes "
                       "(sol.build_vpu_rate / build_mxu_rate / "
                       "build_vmem_rate), same jaxpr op/MAC meter for "
                       "probe and kernel",
    }

    # ---- (c) on-chip stage math cost at radius 2.0 ------------------------
    fc = C.foveation_constants(out_w, out_h, 2.0, (0.5, 0.5), (0.5, 0.5),
                               False)
    centres = np.asarray(
        [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * B, np.int64)
    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (B, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]
    zin = jnp.zeros((B, h_in, w_in), jnp.uint32)

    def bench(fn, iters=30):
        y = fn(imgs[0])
        _ = np.asarray(y[0, 0, 0])

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(imgs[i % 3])
            _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
            return (time.perf_counter() - t0) / n * 1e3
        run(5)
        return min(run(iters) for _ in range(3))

    if nis_mode:
        audit_nis(bench, zin, rate, mxu_rate, rate_meta, centres,
                  (B, h_in, w_in, out_w, out_h), out_path)
        return

    def build(**flags):
        kn = KF.DebugKnobs(**flags)
        return jax.jit(KF.build_fsr_fused(
            B, h_in, w_in, out_w, out_h, sharpness=0.9, centres=centres,
            knobs=kn, interpret=not on_tpu))

    t_base = bench(build())
    t_1fma = bench(build(core_one_fma=True))
    t_move = bench(build(rcas_move=True))
    print(f"on-chip: base={t_base:.3f} one_fma={t_1fma:.3f} "
          f"move={t_move:.3f} ms", flush=True)

    # ---- (d) gather-matmul MXU floor --------------------------------------
    # Stage time: (gather matmuls + texel unpack + 12-term tap mean, no
    # core math) minus (DMA + store machine only). The tap mean is
    # core_one_fma — chosen over mm_only because one_fma CONSUMES every
    # tap, so no gather matmul can be dead-code-eliminated (mm_only keeps
    # only the (0,0) tap alive and Mosaic elides the rest: its r05
    # first-cut "0.233 ms for 94.9 GMAC" implied 407 TMAC/s, 2x the v5e
    # datasheet — a DCE artifact, not a measurement). MAC count: jaxpr
    # walk of the SAME one_fma variant; floor adds the tap-mean's own VPU
    # ops at the session VPU rate.
    t_dma = bench(build(skip_stage1=True, skip_epilogue=True))
    mm_fn = build(core_one_fma=True, skip_epilogue=True)
    t_mm = bench(mm_fn)
    macs_mm = count_macs(mm_fn, zin)
    print(f"mm stage: dma={t_dma:.3f} gathers+mean={t_mm:.3f} ms, "
          f"{macs_mm / 1e9:.2f} GMAC", flush=True)

    # ops_core / ops_rcas are per PIXEL-plane element (their (3, ...)
    # channel work is inside the count), so elems are pixel counts.
    elems_s1 = B * GY * NCHUNK * TH_E * CHUNK
    elems_epi = B * GY * TH * OWP

    def audit(name, t_full, t_probe, d_ops_elem, elems):
        measured = (t_full - t_probe) * 1e-3
        predicted = d_ops_elem * elems / rate
        eff = predicted / measured if measured > 0 else float("nan")
        row = {"stage": name, "measured_ms": round((t_full - t_probe), 4),
               "predicted_floor_ms": round(predicted * 1e3, 4),
               "ops_per_elem": round(d_ops_elem, 1),
               "elems": elems, "efficiency_vs_vpu_floor": round(eff, 3)}
        print(row, flush=True)
        return row

    res = {
        "_meta": {
            "config": "1683x1869 -> 2244x2492 x2 eyes, radius 2.0",
            **rate_meta,
            "base_ms": round(t_base, 4),
            "delta_note": "easu_core / rcas rows are math-only deltas "
                          "(full - probe, same tap/scratch loads on both "
                          "sides): the floor is the jaxpr op count at the "
                          "VPU rate; the excess over it is intra-stage "
                          "temporary VMEM traffic (bounded by "
                          "vmem_load_gbs), not removable ops — the op "
                          "sequence is parity-pinned",
        },
        "stages": [
            audit("easu_core (stage-1 math)", t_base, t_1fma,
                  ops_core - ops_1fma, elems_s1),
            audit("rcas (epilogue math)", t_base, t_move,
                  ops_rcas - ops_move, elems_epi),
        ],
    }
    mm_measured = (t_mm - t_dma) * 1e-3
    # per-resource floors, each a true lower bound on its own: the stage
    # cannot beat its MXU MACs, its tap VMEM traffic, or the mean's VPU ops
    mxu_floor = macs_mm / mxu_rate
    TP = -(-TH_E // 8) * 8
    # tap-plane VMEM traffic per EASU chunk at the default f32 matmul
    # output: the (6*TP, 4*CHUNK) + (6*TP, 2*CHUNK) matmul results written,
    # then 36 (TH_E, CHUNK) tap slices read back by the consume
    mm_out_bytes = 4            # f32 matmul output (mm_bf16_out would be 2)
    tap_bytes_chunk = (6 * TP * 6 * CHUNK + 36 * TH_E * CHUNK) * mm_out_bytes
    tap_bytes = tap_bytes_chunk * NCHUNK * B * GY
    tap_floor = tap_bytes / vmem_rate
    mean_floor = ops_1fma * elems_s1 / rate
    mm_pred = max(mxu_floor, tap_floor, mean_floor)
    mm_row = {
        "stage": "gather_matmuls (stage-1 mm + unpack + tap mean)",
        "measured_ms": round(t_mm - t_dma, 4),
        "predicted_floor_ms": round(mm_pred * 1e3, 4),
        "mxu_floor_ms": round(mxu_floor * 1e3, 4),
        "tap_load_floor_ms": round(tap_floor * 1e3, 4),
        "mean_vpu_floor_ms": round(mean_floor * 1e3, 4),
        "gmacs": round(macs_mm / 1e9, 3),
        "tap_gb": round(tap_bytes / 1e9, 3),
        "efficiency_vs_mxu_floor": round(
            mm_pred / mm_measured if mm_measured > 0 else float("nan"), 3),
        "efficiency_vs_vpu_floor": round(
            mm_pred / mm_measured if mm_measured > 0 else float("nan"), 3),
        "note": "measured with core_one_fma (every tap consumed, nothing "
                "DCE-able — mm_only lets Mosaic elide 11 of 12 taps and "
                "fabricates impossible rates); floor = max of the "
                "per-resource bounds (dot MACs / MXU rate, matmul-output "
                "write + tap read bytes / VMEM plane rate, tap-mean ops / "
                "VPU rate); also carries the texel unpack/3-split work",
    }
    print(mm_row, flush=True)
    res["stages"].append(mm_row)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {out_path}")


def audit_nis(bench, zin, vpu_rate, mxu_rate, rate_meta, centres, geom,
              out_path):
    """NVScaler per-stage floor audit (VERDICT r4 #4 fallback done-bar).

    Measured stage cost: (full kernel) - (kernel with the stage ablated by
    its NisDebugKnobs skip); predicted floor: the grid-aware jaxpr op/MAC
    DELTA between the same two builds, priced at the session's slope rates
    (the shared DMA/index machinery cancels in the delta). Reference
    analog: NIS_Scaler.h:589-770 stage structure.
    """
    import jax

    from openvr_fsr_tpu.core import constants as C
    from openvr_fsr_tpu.kernels.nis import build_nvscaler, NisDebugKnobs

    B, h_in, w_in, out_w, out_h = geom
    on_tpu = jax.default_backend() == "tpu"
    nis_cfg = C.nvscaler_update_config(0.7, w_in, h_in, w_in, h_in,
                                       out_w, out_h, out_w, out_h)

    def build(**flags):
        return jax.jit(build_nvscaler(
            B, h_in, w_in, out_w, out_h, nis_cfg=nis_cfg, centres=centres,
            knobs=NisDebugKnobs(**flags), interpret=not on_tpu))

    variants = [("full", {}),
                ("skip_normal", {"skip_normal": True}),
                ("skip_f0f90", {"skip_f0f90": True}),
                ("skip_diag", {"skip_diag": True}),
                ("skip_edge", {"skip_edge": True}),
                ("dma_machine", {"skip_stage1": True})]
    rows, counts, times = [], {}, {}
    for name, flags in variants:
        fn = build(**flags)
        times[name] = bench(fn)
        counts[name] = (count_ops_grid(fn, zin), count_macs(fn, zin))
        print(f"nis {name}: {times[name]:.3f} ms, "
              f"{counts[name][0] / 1e9:.2f} Gop, "
              f"{counts[name][1] / 1e9:.2f} GMAC", flush=True)

    f_ops, f_macs = counts["full"]
    for name, _ in variants[1:-1]:
        d_ops = f_ops - counts[name][0]
        d_macs = f_macs - counts[name][1]
        measured = (times["full"] - times[name]) * 1e-3
        pred = d_ops / vpu_rate + d_macs / mxu_rate
        rows.append({
            "stage": name.replace("skip_", ""),
            "measured_ms": round(times["full"] - times[name], 4),
            "predicted_floor_ms": round(pred * 1e3, 4),
            "d_gops": round(d_ops / 1e9, 3),
            "d_gmacs": round(d_macs / 1e9, 3),
            "efficiency_vs_vpu_floor": round(
                pred / measured if measured > 0 else float("nan"), 3),
        })
        print(rows[-1], flush=True)
    res = {
        "_meta": {
            "config": "NVScaler 1683x1869 -> 2244x2492 x2 eyes, radius 2.0,"
                      " sharpness 0.7",
            **rate_meta,
            "full_ms": round(times["full"], 4),
            "dma_machine_ms": round(times["dma_machine"], 4),
            "stage_method": "measured = full - skip_<stage> on-chip; floor "
                            "= (grid-aware jaxpr op delta)/VPU rate + (MAC "
                            "delta)/MXU rate — shared machinery cancels in "
                            "the delta",
        },
        "stages": rows,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

"""Consolidated TPU microbenchmarks (one file, subcommands).

Usage: python tools/microbench.py {infra|v3|lanes|launch|calibrate|overlap}

Subcommands (formerly microbench.py .. microbench4.py; measured conclusions
cited in ARCHITECTURE.md "Performance methodology"):

  infra     Isolate Pallas infrastructure costs on the TPU tunnel: launch
            overhead, DMA, unpack/pack, band elementwise, store.
  v3        Second-stage microbench: validate the v3 fused-kernel restructure.
  lanes     XLA-side phase split/interleave costs at headline sizes.
  launch    Launch-overhead isolation: N kernel executions inside ONE jit.
  calibrate Session HBM/MXU rates — the yardstick every absolute kernel
            time must be read against (the tunnel chip drifts ~35%).
  overlap   Does the chip hide DMA/copy-out behind VPU compute? (the
            question behind the fused kernel's additive IO+compute floor)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


# ===== infra =================================================================
# Isolate Pallas infrastructure costs on the TPU tunnel: launch overhead,
# HBM->VMEM DMA, u32 unpack/pack, band-sized elementwise ops, output store.
#
# Each case is a minimal kernel shaped like the fused FSR kernel's bands:
# grid (2, 20), input (2, 1872, 1792) u32, output (2, 2560, 2304) u32.

def main_infra():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, GY = 2, 20
    IH, WP = 112, 1792           # per-band input window
    TH, OWP = 128, 2304          # per-band output (lane-aligned here)
    H_IN = 1872
    TOTAL = B * GY

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (B, H_IN, WP), dtype=np.uint32))
        for _ in range(3)]

    def bench(fn, iters=40):
        y = fn(imgs[0])
        _ = np.asarray(y[0, 0, 0])

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(imgs[i % 3])
            _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
            return (time.perf_counter() - t0) / n * 1000.0
        run(5)
        return min(run(iters) for _ in range(3))

    def make(mode, n_ops=0):
        """mode: 'zeros' | 'copy' | 'unpackpack' | 'ops'"""
        def kernel(img, out_ref, inbuf, sems):
            b = pl.program_id(0)
            i = pl.program_id(1)
            step = b * GY + i

            def dma(slot, bb, ii):
                src = img.at[bb, pl.ds(pl.multiple_of(ii * 88, 8), IH)]
                return pltpu.make_async_copy(src, inbuf.at[slot],
                                             sems.at[slot])

            @pl.when(step == 0)
            def _():
                dma(0, b, i).start()

            @pl.when(step + 1 < TOTAL)
            def _():
                dma((step + 1) % 2, (step + 1) // GY, (step + 1) % GY).start()

            slot = jax.lax.rem(step, 2)
            dma(slot, b, i).wait()

            if mode == "zeros":
                out_ref[0] = jnp.zeros((TH, OWP), jnp.uint32)
                return
            raw = inbuf[slot].astype(jnp.int32)

            def to_band(row8):  # (8, WP) -> (TH, OWP) dependent data
                r = jnp.concatenate([row8, row8[:, :OWP - WP]], axis=1)
                return jnp.broadcast_to(r[None], (TH // 8, 8, OWP)
                                        ).reshape(TH, OWP)

            if mode == "copy":
                out_ref[0] = to_band(raw[:8].astype(jnp.uint32))
                return
            chans = [jnp.bitwise_and(raw, 255).astype(jnp.bfloat16),
                     jnp.bitwise_and(
                         jax.lax.shift_right_logical(raw, 8), 255
                     ).astype(jnp.bfloat16),
                     jnp.bitwise_and(
                         jax.lax.shift_right_logical(raw, 16), 255
                     ).astype(jnp.bfloat16)]
            planes = []
            for c in range(3):
                x = to_band(chans[c][:8].astype(jnp.float32))
                for _ in range(n_ops):
                    x = x * np.float32(1.000001) + np.float32(0.5)
                planes.append(x)
            q8 = [jnp.round(jnp.clip(p, 0.0, 255.0)).astype(jnp.int32)
                  for p in planes]
            packed = (q8[0] + jax.lax.shift_left(q8[1], 8)
                      + jax.lax.shift_left(q8[2], 16)
                      + jnp.int32(-16777216))
            out_ref[0] = packed.astype(jnp.uint32)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, GY),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, TH, OWP), lambda b, i: (b, i, 0)),
            scratch_shapes=[pltpu.VMEM((2, IH, WP), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, GY * TH, OWP), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        return jax.jit(call)

    for name, kw in [
        ("dma + zeros store", dict(mode="zeros")),
        ("dma + dependent copy store", dict(mode="copy")),
        ("dma + unpack/pack roundtrip", dict(mode="ops", n_ops=0)),
        ("unpack/pack + 10 band f32 FMAs", dict(mode="ops", n_ops=10)),
        ("unpack/pack + 40 band f32 FMAs", dict(mode="ops", n_ops=40)),
        ("unpack/pack + 100 band f32 FMAs", dict(mode="ops", n_ops=100)),
    ]:
        ms = bench(make(**kw))
        print(f"{name:38s} {ms:7.3f} ms", flush=True)

    # pure-XLA reference points
    x = imgs[0]
    f_iden = jax.jit(lambda a: a + np.uint32(1))
    print(f"{'XLA u32 +1 (in-shape)':38s} {bench(f_iden):7.3f} ms",
          flush=True)
    big = jax.device_put(np.zeros((B, GY * TH, OWP), np.uint32))
    f_big = jax.jit(lambda a: a + np.uint32(1))
    y = f_big(big)
    t0 = time.perf_counter()
    for _ in range(40):
        y = f_big(y)
    _ = np.asarray(y[0, 0, 0])
    print(f"{'XLA u32 +1 (out-shape, chained)':38s} "
          f"{(time.perf_counter() - t0) / 40 * 1000:7.3f} ms")



# ===== overlap ===============================================================
# Does this chip overlap DMA/copy-out with VPU compute at all?
#
# The fused kernel's measured components are ADDITIVE (IO floor 1.1 ms +
# compute 2.3 ms = 3.4 total): if the manual input DMA and the pipeline's
# output copy-out overlapped compute, the kernel would run at
# max(IO, compute) = 2.3 ms. This probe sweeps VPU busywork M inside the
# infra skeleton under three ablations and prints where the time goes:
#
#   full(M)       input DMA + unpack + M band FMAs + full-window store
#   nodma(M)      same compute/store, input never copied (scratch iota)
#   smallstore(M) same DMA/compute, 1/16-height output window
#
# If full(M) - nodma(M) stays ~= the input-DMA SOL across M, input DMA is
# serialized (never hidden behind compute). If it shrinks toward 0 as M
# grows, the DMA engine overlaps and the fused kernel's floor is
# structural, not physical. Same logic for store via smallstore.

def main_overlap():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, GY = 2, 20
    IH, WP = 112, 1792
    TH, OWP = 128, 2304
    H_IN = 1872
    TOTAL = B * GY

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (B, H_IN, WP), dtype=np.uint32))
        for _ in range(3)]

    def bench(fn, iters=30):
        y = fn(imgs[0])
        _ = np.asarray(y[0, 0, 0])

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(imgs[i % 3])
            _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
            return (time.perf_counter() - t0) / n * 1000.0
        run(5)
        return min(run(iters) for _ in range(3))

    def make(m, dma_in=True, th_out=TH):
        def kernel(img, out_ref, inbuf, sems):
            b = pl.program_id(0)
            i = pl.program_id(1)
            step = b * GY + i

            def dma(slot, bb, ii):
                src = img.at[bb, pl.ds(pl.multiple_of(ii * 88, 8), IH)]
                return pltpu.make_async_copy(src, inbuf.at[slot],
                                             sems.at[slot])

            if dma_in:
                @pl.when(step == 0)
                def _():
                    dma(0, b, i).start()

                @pl.when(step + 1 < TOTAL)
                def _():
                    dma((step + 1) % 2, (step + 1) // GY,
                        (step + 1) % GY).start()
                slot = jax.lax.rem(step, 2)
                dma(slot, b, i).wait()
                raw = inbuf[slot].astype(jnp.int32)
                row8 = jnp.bitwise_and(raw[:8], 255).astype(jnp.float32)
            else:
                row8 = (jax.lax.broadcasted_iota(jnp.int32, (8, WP), 1)
                        & 255).astype(jnp.float32)

            r = jnp.concatenate([row8, row8[:, :OWP - WP]], axis=1)
            x = jnp.broadcast_to(r[None], (TH // 8, 8, OWP)).reshape(TH, OWP)
            for _ in range(m):
                x = x * np.float32(1.000001) + np.float32(0.5)
            q8 = jnp.round(jnp.clip(x, 0.0, 255.0)).astype(jnp.int32)
            packed = (q8 + jax.lax.shift_left(q8, 8)
                      + jnp.int32(-16777216)).astype(jnp.uint32)
            out_ref[0] = packed[:th_out]

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, GY),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, th_out, OWP), lambda b, i: (b, i, 0)),
            scratch_shapes=[pltpu.VMEM((2, IH, WP), jnp.uint32),
                            pltpu.SemaphoreType.DMA((2,))],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, GY * th_out, OWP), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))
        return jax.jit(call)

    in_mb = TOTAL * IH * WP * 4 / 1e6
    out_mb = TOTAL * TH * OWP * 4 / 1e6
    print(f"traffic: in {in_mb:.0f} MB, out {out_mb:.0f} MB "
          f"(x{TOTAL} bands)", flush=True)
    rows = {}
    for m in (0, 5, 10, 20, 40, 80):
        t_full = bench(make(m))
        t_nodma = bench(make(m, dma_in=False))
        t_small = bench(make(m, th_out=8))
        rows[m] = (t_full, t_nodma, t_small)
        print(f"M={m:3d}  full {t_full:7.3f}  nodma {t_nodma:7.3f} "
              f"(dma-cost {t_full - t_nodma:+6.3f})  smallstore "
              f"{t_small:7.3f} (store-cost {t_full - t_small:+6.3f})",
              flush=True)
    d0 = rows[0][0] - rows[0][1]
    dN = rows[80][0] - rows[80][1]
    print(f"input-DMA serialization: {d0:.3f} ms at M=0 -> {dN:.3f} ms at "
          f"M=80 ({'HIDDEN behind compute' if dN < 0.5 * d0 else 'NOT hidden'})",
          flush=True)
    s0 = rows[0][0] - rows[0][2]
    sN = rows[80][0] - rows[80][2]
    print(f"store serialization:     {s0:.3f} ms at M=0 -> {sN:.3f} ms at "
          f"M=80 ({'HIDDEN behind compute' if sN < 0.5 * s0 else 'NOT hidden'})",
          flush=True)


# ===== v3 ====================================================================
# Second-stage microbench: validate the v3 fused-kernel restructure.
#
# Cases (all grid (2,20), same DMA skeleton as microbench.py):
#   A. easu_core per 128-col chunk (current structure, 18 calls/band)
#   B. easu_core band-wide once on (3, 130, 2304) taps from scratch
#   C. matmul issue rate: N x (520,100)@(100,256) bf16 per band
#   D. pltpu.roll-based 5-tap cross vs concat+shift slices
#   E. lane interleave of 4 phase planes -> (128, 2304)

def main_v3():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from openvr_fsr_tpu.ops.easu import easu_core, TAP_ORDER

    B, GY = 2, 20
    IH, WP = 112, 1792
    TH, OWP = 128, 2304
    TH_E = TH + 2
    H_IN = 1872
    TOTAL = B * GY

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (B, H_IN, WP), dtype=np.uint32))
        for _ in range(3)]
    def make_pp(w):   # trace-time fractional coords from iota (no consts)
        import jax
        import jax.numpy as jnp
        px = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
              .astype(jnp.float32) * np.float32(0.37)) % np.float32(1.0)
        py = (jax.lax.broadcasted_iota(jnp.int32, (TH_E, 1), 0)
              .astype(jnp.float32) * np.float32(0.29)) % np.float32(1.0)
        return px, py
    oh_rows = jax.device_put(  # fake one-hot-ish row matrix
        rng.random((520, IH), np.float32).astype(jnp.bfloat16))
    oh_cols = jax.device_put(
        rng.random((100, 256), np.float32).astype(jnp.bfloat16))

    def bench(fn, extra=(), iters=30):
        y = fn(imgs[0], *extra)
        _ = np.asarray(y[0, 0, 0])

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(imgs[i % 3], *extra)
            _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
            return (time.perf_counter() - t0) / n * 1000.0
        run(3)
        return min(run(iters) for _ in range(2))

    def skeleton(body, extra_scratch=(), extra_in=()):
        def kernel(img, *refs):
            out_ref = refs[len(extra_in)]
            scratch = refs[len(extra_in) + 1:]
            inbuf, sems = scratch[0], scratch[-1]
            b = pl.program_id(0)
            i = pl.program_id(1)
            step = b * GY + i

            def dma(slot, bb, ii):
                src = img.at[bb, pl.ds(pl.multiple_of(ii * 88, 8), IH)]
                return pltpu.make_async_copy(src, inbuf.at[slot],
                                             sems.at[slot])

            @pl.when(step == 0)
            def _():
                dma(0, b, i).start()

            @pl.when(step + 1 < TOTAL)
            def _():
                dma((step + 1) % 2, (step + 1) // GY,
                    (step + 1) % GY).start()

            slot = jax.lax.rem(step, 2)
            dma(slot, b, i).wait()
            body(inbuf[slot], refs[:len(extra_in)], out_ref,
                 scratch[1:-1])

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B, GY),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.ANY
                            if False else pltpu.VMEM)
               for _ in extra_in],
            out_specs=pl.BlockSpec((1, TH, OWP), lambda b, i: (b, i, 0)),
            scratch_shapes=[pltpu.VMEM((2, IH, WP), jnp.uint32)]
            + list(extra_scratch) + [pltpu.SemaphoreType.DMA((2,))],
        )
        call = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, GY * TH, OWP), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024))
        return jax.jit(lambda x, *e: call(x, *e))

    F32 = np.float32

    def fake_taps_chunk(base, c0):
        # 12 taps as cheap shifted views of one (3, TH_E, 128) slab
        sl = base[:, :, c0:c0 + 128]
        return {off: sl * F32(1.0 + 0.001 * i)
                for i, off in enumerate(TAP_ORDER)}

    def store_u32(out_ref, res):
        q8 = jnp.round(jnp.clip(res, F32(0), F32(1))
                       * F32(255)).astype(jnp.int32)
        out_ref[0] = (q8[0] + jax.lax.shift_left(q8[1], 8)
                      + jax.lax.shift_left(q8[2], 16)
                      + jnp.int32(-16777216)).astype(jnp.uint32)

    # --- A: easu_core per chunk ------------------------------------------
    def body_a(band, _ins, out_ref, scratch):
        s_easu = scratch[0]
        base = jnp.broadcast_to(
            (band[:8, :].astype(jnp.int32) & 255).astype(jnp.float32)
            [None, None] * F32(1 / 255),
            (3, (TH_E + 7) // 8, 8, WP)).reshape(3, -1, WP)[:, :TH_E, :OWP]
        # pad cols WP->OWP via wrap
        base = jnp.concatenate([base, base[:, :, :OWP - WP]], axis=2)
        for k in range(18):
            c0 = k * 128
            taps = fake_taps_chunk(base, c0)
            cpx, cpy = make_pp(128)
            s_easu[:, :, c0:c0 + 128] = easu_core(
                taps, cpx, cpy).astype(jnp.float32)
        store_u32(out_ref, s_easu[:, 1:1 + TH])

    fa = skeleton(body_a, extra_scratch=[
        pltpu.VMEM((3, TH_E, OWP), jnp.float32)])

    # --- B: easu_core band-wide ------------------------------------------
    def body_b(band, _ins, out_ref, scratch):
        s_easu = scratch[0]
        base = jnp.broadcast_to(
            (band[:8, :].astype(jnp.int32) & 255).astype(jnp.float32)
            [None, None] * F32(1 / 255),
            (3, (TH_E + 7) // 8, 8, WP)).reshape(3, -1, WP)[:, :TH_E, :OWP]
        base = jnp.concatenate([base, base[:, :, :OWP - WP]], axis=2)
        taps = {off: base * F32(1.0 + 0.001 * i)
                for i, off in enumerate(TAP_ORDER)}
        bpx, bpy = make_pp(OWP)
        s_easu[:] = easu_core(taps, bpx, bpy).astype(jnp.float32)
        store_u32(out_ref, s_easu[:, 1:1 + TH])

    fb = skeleton(body_b, extra_scratch=[
        pltpu.VMEM((3, TH_E, OWP), jnp.float32)])

    # --- C: phase-stencil building blocks ---------------------------------
    def body_strided(band, _ins, out_ref, scratch):
        s = scratch[0]
        raw = band.astype(jnp.int32)
        # lane stride-3 split via reshape: 3 col-phase planes (IH, 576)
        r3 = raw[:, :3 * 576].reshape(IH, 576, 3)
        planes = [r3[:, :, r] for r in range(3)]
        # sublane stride-3 split of each via reshape
        rows = [p[:108].reshape(36, 3, 576)[:, s0] for p in planes
                for s0 in range(3)]
        acc = rows[0]
        for r in rows[1:]:
            acc = acc + r
        a8 = acc[:8]
        t = jnp.broadcast_to(a8[None], (TH // 8, 8, 576)).reshape(TH, 576)
        out_ref[0] = jnp.concatenate(
            [t, t, t, t], axis=1).astype(jnp.uint32)

    fstrided = skeleton(body_strided, extra_scratch=[
        pltpu.VMEM((TH, 576), jnp.float32)])

    def body_phase_easu(band, _ins, out_ref, scratch):
        s_out = scratch[0]   # (4, TH//4 pad 32, 4*576)
        raw = band.astype(jnp.int32)
        base = (raw[:32, :576] & 255).astype(jnp.float32) * F32(1 / 255)
        for p in range(4):
            for q in range(4):
                taps = {off: base[None] * F32(1.0 + 0.001 * i)
                        for i, off in enumerate(TAP_ORDER)}
                taps = {k: jnp.broadcast_to(v, (3, 32, 576))
                        for k, v in taps.items()}
                ppx_q = F32(0.875 - 0.25 * q)
                ppy_p = F32(0.875 - 0.25 * p)
                r = easu_core(taps, ppx_q, ppy_p)
                s_out[p, :, q * 576:(q + 1) * 576] = r[1]
        # fold phases back with a cheap broadcast store (interleave timed
        # separately in case E)
        t = jnp.broadcast_to(s_out[0][:8][None],
                             (TH // 8, 8, 4 * 576)).reshape(TH, OWP)
        store_u32(out_ref, jnp.broadcast_to(t[None], (3, TH, OWP)))

    fphase = skeleton(body_phase_easu, extra_scratch=[
        pltpu.VMEM((4, 32, 4 * 576), jnp.float32)])

    # --- D: roll vs concat 5-tap cross -----------------------------------
    def body_roll(band, _ins, out_ref, scratch):
        s = scratch[0]
        base = jnp.broadcast_to(
            (band[:8, :].astype(jnp.int32) & 255).astype(jnp.float32)
            [None, None] * F32(1 / 255),
            (3, (TH_E + 7) // 8, 8, WP)).reshape(3, -1, WP)[:, :TH_E, :OWP]
        base = jnp.concatenate([base, base[:, :, :OWP - WP]], axis=2)
        s[:] = base
        e = s[:, 1:1 + TH]
        bq = s[:, 0:TH]
        hq = s[:, 2:2 + TH]
        d = pltpu.roll(e, 1, 2)
        f = pltpu.roll(e, OWP - 1, 2)
        res = (bq + hq + d + f) * F32(0.25) + e * F32(0.5)
        store_u32(out_ref, res * F32(0.5))

    froll = skeleton(body_roll, extra_scratch=[
        pltpu.VMEM((3, TH_E, OWP), jnp.float32)])

    def body_concat(band, _ins, out_ref, scratch):
        s = scratch[0]
        base = jnp.broadcast_to(
            (band[:8, :].astype(jnp.int32) & 255).astype(jnp.float32)
            [None, None] * F32(1 / 255),
            (3, (TH_E + 7) // 8, 8, WP)).reshape(3, -1, WP)[:, :TH_E, :OWP]
        base = jnp.concatenate([base, base[:, :, :OWP - WP]], axis=2)
        s[:] = base
        padl = jnp.zeros((3, TH_E, 1), jnp.float32)
        qx = jnp.concatenate([padl, s[...], padl], axis=2)
        e = qx[:, 1:1 + TH, 1:1 + OWP]
        bq = qx[:, 0:TH, 1:1 + OWP]
        hq = qx[:, 2:2 + TH, 1:1 + OWP]
        d = qx[:, 1:1 + TH, 0:OWP]
        f = qx[:, 1:1 + TH, 2:2 + OWP]
        res = (bq + hq + d + f) * F32(0.25) + e * F32(0.5)
        store_u32(out_ref, res * F32(0.5))

    fconcat = skeleton(body_concat, extra_scratch=[
        pltpu.VMEM((3, TH_E, OWP), jnp.float32)])

    # --- E: lane interleave 4 -> 1 (phase-major planes -> column-major) ----
    # measures what a phase-decomposed kernel would pay to interleave its 4
    # per-phase output planes back into pixel order inside the kernel
    def body_inter(band, _ins, out_ref, scratch):
        q = OWP // 4                              # 576 cols per phase plane
        src = (band[:8, :].astype(jnp.int32) & 255).astype(jnp.uint32)
        base = jnp.broadcast_to(
            src[None], ((TH + 7) // 8, 8, WP)).reshape(-1, WP)[:TH]
        wide = jnp.concatenate([base, base[:, :OWP - WP]], axis=1)
        planes = [wide[:, k * q:(k + 1) * q] for k in range(4)]
        st = jnp.stack(planes, axis=-1)           # (TH, 576, 4)
        out_ref[0] = st.reshape(TH, OWP)

    finter = skeleton(body_inter)

    print(f"A easu_core per 128-chunk:   {bench(fa):7.3f} ms", flush=True)
    print(f"B easu_core band-wide:       {bench(fb):7.3f} ms", flush=True)
    print(f"C1 stride-3 phase split:     {bench(fstrided):7.3f} ms",
          flush=True)
    print(f"C2 phase-major easu 4x4:     {bench(fphase):7.3f} ms", flush=True)
    print(f"5-tap cross via pltpu.roll:  {bench(froll):7.3f} ms", flush=True)
    print(f"5-tap cross via concat+slice:{bench(fconcat):7.3f} ms",
          flush=True)
    try:
        print(f"lane interleave 4->2304:     {bench(finter):7.3f} ms",
              flush=True)
    except Exception as e:
        # The load-bearing finding for the phase-decomposed kernel idea:
        # Mosaic cannot lane-stride ('unsupported shape cast'), so phase
        # interleaving must happen as XLA ops outside the kernel
        # (tools/microbench.py lanes measures that cost instead).
        print(f"lane interleave 4->2304:     unsupported by Mosaic "
              f"({str(e).splitlines()[0][:60]}...)", flush=True)



# ===== lanes =================================================================
# XLA-side phase split/interleave costs at headline sizes.
#
# The phase-stencil FSR kernel needs (a) input column-deinterleave x3 in the
# jit prologue, (b) output column-interleave x4 in the epilogue. Mosaic cannot
# lane-stride in-kernel ('unsupported shape cast'), so these run as XLA ops in
# the same launch. This measures their device cost by amortization: time
# f(x) vs f(f(f(f(x)))) chains.

def main_lanes():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def timeit(fn, x, iters=30):
        y = fn(x)
        jax.block_until_ready(y)
        _ = np.asarray(jnp.ravel(y if not isinstance(y, (tuple, list))
                                 else y[0])[0])

        def run(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(x)
            r = out if not isinstance(out, (tuple, list)) else out[0]
            _ = np.asarray(jnp.ravel(r)[0])
            return (time.perf_counter() - t0) / n * 1000.0
        run(5)
        return min(run(iters) for _ in range(3))

    # --- input deinterleave: (2,1872,1792)u32 -> (2,3,1872,600) -----------
    x_in = jax.device_put(
        rng.integers(0, 2**32, (2, 1872, 1792), dtype=np.uint32))

    def deinter(x):
        planes = [x[:, :, r:1683:3] for r in range(3)]
        # pad each to 564 lanes and stack on a new axis
        planes = [jnp.pad(p, ((0, 0), (0, 0), (1, 563 - p.shape[2] + 1)))
                  for p in planes]
        return jnp.stack(planes, axis=1)

    def deinter4(x):
        y = deinter(x)
        for _ in range(3):
            y = deinter(y[:, 0] + jnp.uint32(1))
        return y

    t1 = timeit(deinter, x_in)
    t4 = timeit(deinter4, x_in)
    print(f"deinterleave x3 cols: launch+1 = {t1:6.3f} ms, "
          f"marginal = {(t4 - t1) / 3:6.3f} ms", flush=True)

    # --- output interleave: 4x(2,2492,576)u32 -> (2,2492,2244) ------------
    planes = jax.device_put(
        rng.integers(0, 2**32, (2, 4, 2492, 576), dtype=np.uint32))

    def inter(p):
        st = jnp.stack([p[:, 0], p[:, 1], p[:, 2], p[:, 3]], axis=-1)
        return st.reshape(2, 2492, 2304)[:, :, :2244]

    def inter4(p):
        y = inter(p)
        for _ in range(3):
            q = jnp.pad(y, ((0, 0), (0, 0), (0, 60))).reshape(
                2, 2492, 576, 4)
            y = inter(jnp.moveaxis(q, -1, 1))
        return y

    t1 = timeit(inter, planes)
    t4 = timeit(inter4, planes)
    print(f"interleave x4 cols:   launch+1 = {t1:6.3f} ms, "
          f"marginal = {(t4 - t1) / 3:6.3f} ms", flush=True)

    # --- reference: plain u32 copy of the output size ----------------------
    big = jax.device_put(
        rng.integers(0, 2**32, (2, 2492, 2244), dtype=np.uint32))

    def copy1(x):
        return x + jnp.uint32(1)

    def copy4(x):
        y = x
        for _ in range(4):
            y = y + jnp.uint32(1)
        return y

    t1 = timeit(copy1, big)
    t4 = timeit(copy4, big)
    print(f"u32 +1 out-size:      launch+1 = {t1:6.3f} ms, "
          f"marginal = {(t4 - t1) / 3:6.3f} ms", flush=True)



# ===== launch ================================================================
# Launch-overhead isolation: N kernel executions inside ONE jit (via
# lax.fori_loop) vs N back-to-back launches. The difference per iteration is
# the per-launch tunnel/dispatch overhead; the in-loop time is the true
# device steady-state — the analog of the reference's GPU-timestamp metric
# (PostProcessor.cpp:601-628 measures GPU time around the dispatches, not
# host dispatch cost).

def main_launch():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu import Config, Pipeline

    h_in, w_in = 1869, 1683
    cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
    pipe = Pipeline(cfg)
    fn = pipe._build(2, h_in, w_in, (0, 1))

    rng = np.random.default_rng(0)
    stack = jax.device_put(
        rng.integers(0, 256, (3, 2, h_in, w_in, 4)).astype(np.uint8))

    # --- N back-to-back launches ------------------------------------------
    y = fn(stack[0])
    _ = np.asarray(y[0, 0, 0])

    def run_multi(n):
        t0 = time.perf_counter()
        for i in range(n):
            y = fn(stack[i % 3])
        _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
        return (time.perf_counter() - t0) / n * 1000.0

    run_multi(5)
    multi = min(run_multi(40) for _ in range(3))
    print(f"back-to-back launches: {multi:6.3f} ms/pair", flush=True)

    # --- N executions inside one jit ---------------------------------------
    ITERS = 20

    @jax.jit
    def looped(stack):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(stack, i % 3, keepdims=False)
            out = fn(x)
            return acc + out[0, 0, 0, 0].astype(jnp.uint32)
        return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

    r = looped(stack)
    _ = np.asarray(r)

    def run_loop():
        t0 = time.perf_counter()
        r = looped(stack)
        _ = np.asarray(r)
        return (time.perf_counter() - t0) / ITERS * 1000.0

    run_loop()
    loop = min(run_loop() for _ in range(5))
    print(f"in-jit fori_loop:      {loop:6.3f} ms/pair  "
          f"(per-launch overhead ~= {multi - loop:5.3f} ms)", flush=True)



# ===== calibrate =============================================================
# Raw device rates of the tunneled chip — the speed-of-light yardstick every
# kernel time must be read against. Round-3 finding: the "TPU v5 lite"
# behind the axon tunnel sustains ~35-40 GB/s per direction (~75 GB/s
# copy r+w) and ~66 bf16 TFLOP/s — far below v5e datasheet numbers
# (819 GB/s, 197 TFLOP/s). The fused kernel's 1.1 ms DMA+store floor at
# the headline config is exactly 70 MB of HBM traffic at these rates.

def main_calibrate():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.integers(0, 2**32, (2, 2560, 2304), dtype=np.uint32))  # 47 MB
    nbytes = x.size * 4

    def timeit(fn, n=30, rounds=4):
        y = fn(x)
        jax.block_until_ready(y)
        _ = np.asarray(jnp.ravel(y)[0])
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                y = fn(x)
            _ = np.asarray(jnp.ravel(y)[0])
            ts.append((time.perf_counter() - t0) / n * 1000.0)
        return min(ts)

    copy = jax.jit(lambda a: a + jnp.uint32(1))
    red = jax.jit(lambda a: jnp.sum(a, axis=(1, 2)))
    fill = jax.jit(lambda a: jnp.full(x.shape, a[0, 0, 0]))
    t = timeit(copy)
    print(f"copy(+1) 47MB : {t:7.3f} ms = {nbytes*2/1e9/(t/1e3):4.0f} GB/s r+w")
    t = timeit(red)
    print(f"read-reduce   : {t:7.3f} ms = {nbytes/1e9/(t/1e3):4.0f} GB/s read")
    t = timeit(fill)
    print(f"fill          : {t:7.3f} ms = {nbytes/1e9/(t/1e3):4.0f} GB/s write")

    for dt, tag in (("bfloat16", "bf16"), (np.float32, "f32 ")):
        a = jax.device_put(rng.standard_normal((4096, 4096)).astype(dt))
        mm = jax.jit(lambda a: a @ a)
        y = mm(a)
        jax.block_until_ready(y)
        _ = np.asarray(y[0, 0])
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(20):
                y = mm(a)
            _ = np.asarray(y[0, 0])
            ts.append((time.perf_counter() - t0) / 20 * 1000.0)
        t = min(ts)
        print(f"{tag} 4096^3 mm: {t:7.3f} ms = "
              f"{2*4096**3/1e12/(t/1e3):4.0f} TFLOP/s")


MAINS = {"infra": main_infra, "v3": main_v3, "lanes": main_lanes,
         "launch": main_launch, "calibrate": main_calibrate,
         "overlap": main_overlap}

if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in MAINS:
        sys.exit(f"usage: microbench.py {{{'|'.join(MAINS)}}}")
    sub = sys.argv.pop(1)   # subcommand args shift down for the main
    MAINS[sub]()

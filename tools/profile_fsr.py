"""Kernel-level profiling sweep for the fused FSR Pallas kernel.

Builds kernels/fsr.build_fsr_fused directly (no pipeline wrapper) at the
bench headline config and times variants: debug knobs (_SKIP_STAGE1,
_SKIP_RCAS, _NO_GATING), band_rows / chunk sweeps, radius settings.

Usage: python tools/profile_fsr.py [--quick]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu.core import constants as C
    from openvr_fsr_tpu.kernels import fsr as KF

    h_in, w_in = 1869, 1683
    out_w, out_h = 2244, 2492

    def centres(radius):
        fc = C.foveation_constants(out_w, out_h, radius,
                                   (0.5, 0.5), (0.5, 0.5), False)
        return np.asarray(
            [[*fc.centre_left, *fc.centre_right, fc.radius_sq]] * 2, np.int64)

    rng = np.random.default_rng(0)
    imgs = [jax.device_put(
        rng.integers(0, 2**32, (2, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]

    def bench(fn, iters=40):
        y = fn(imgs[0])
        _ = np.asarray(y[0, 0, 0])   # compile + completion

        def run(n):
            t0 = time.perf_counter()
            for i in range(n):
                y = fn(imgs[i % 3])
            _ = np.asarray(jnp.sum(y[:, ::373, ::373]))
            return (time.perf_counter() - t0) / n * 1000.0
        run(5)
        return min(run(iters) for _ in range(3))

    def build(radius=0.5, band_rows=128, chunk=128, precision="full",
              **flags):
        knobs = KF.DebugKnobs(
            **{k.lstrip("_").lower(): v for k, v in flags.items()})
        fn = KF.build_fsr_fused(
            2, h_in, w_in, out_w, out_h, sharpness=0.9,
            centres=centres(radius), band_rows=band_rows, chunk=chunk,
            precision=precision, knobs=knobs)
        return jax.jit(fn)

    quick = "--quick" in sys.argv
    rows = []

    def report(name, **kw):
        try:
            ms = bench(build(**kw))
        except Exception as e:  # e.g. VMEM OOM on oversized band/chunk combos
            print(f"{name:44s}  FAILED: {str(e)[:120]}", flush=True)
            return
        rows.append((name, ms))
        print(f"{name:44s} {ms:7.3f} ms", flush=True)

    report("baseline r=0.5 band=128 chunk=128")
    report("dma+write only", _SKIP_STAGE1=True, _SKIP_EPILOGUE=True)
    report("dma+epilogue+rcas (no stage1)", _SKIP_STAGE1=True)
    report("dma+stage1+epilogue (no rcas)", _SKIP_RCAS=True)
    report("stage1 only (no epilogue)", _SKIP_EPILOGUE=True)
    report("no-gating (easu+bil all chunks)", _NO_GATING=True)
    report("radius=2.0 (all inside)", radius=2.0)
    report("radius=0.0 (all outside: bilinear)", radius=0.0)
    # r5 per-stage floor probes (VERDICT item 1): each keeps the stage's
    # machine and zeroes its math, so stage-vs-floor gaps are standalone
    report("r4 epilogue (no band gate)", _NO_EPI_BAND_GATE=True)
    report("floor: gather mm only (stage1)", _MM_ONLY=True,
           _SKIP_EPILOGUE=True)
    report("floor: gathers + 12-tap fma core", _CORE_ONE_FMA=True,
           _SKIP_EPILOGUE=True)
    report("floor: full stage1 + rcas->move", _RCAS_MOVE=True)
    report("floor: fma core + rcas->move", _CORE_ONE_FMA=True,
           _RCAS_MOVE=True)
    report("no row-gather prologue", _SKIP_PROLOGUE=True)
    if not quick:
        report("band=64", band_rows=64)
        report("band=256", band_rows=256)
        report("chunk=256", chunk=256)
        report("chunk=384", chunk=384)
        report("band=256 chunk=256", band_rows=256, chunk=256)
        report("precision=half", precision="half")
        report("r=2 chunk=256", radius=2.0, chunk=256)
        report("r=2 band=256 chunk=256", radius=2.0,
               band_rows=256, chunk=256)

    print("\nSummary:")
    for name, ms in rows:
        print(f"  {name:44s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()

"""Isolate Pallas infrastructure costs on the TPU tunnel: launch overhead,
HBM->VMEM DMA, u32 unpack/pack, band-sized elementwise ops, output store.

Each case is a minimal kernel shaped like the fused FSR kernel's bands:
grid (2, 20), input (2, 1872, 1792) u32, output (2, 2560, 2304) u32.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
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


if __name__ == "__main__":
    main()

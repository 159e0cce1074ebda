"""XLA-side phase split/interleave costs at headline sizes.

The phase-stencil FSR kernel needs (a) input column-deinterleave x3 in the
jit prologue, (b) output column-interleave x4 in the epilogue. Mosaic cannot
lane-stride in-kernel ('unsupported shape cast'), so these run as XLA ops in
the same launch. This measures their device cost by amortization: time
f(x) vs f(f(f(f(x)))) chains.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
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


if __name__ == "__main__":
    main()

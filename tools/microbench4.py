"""Launch-overhead isolation: N kernel executions inside ONE jit (via
lax.fori_loop) vs N back-to-back launches. The difference per iteration is
the per-launch tunnel/dispatch overhead; the in-loop time is the true
device steady-state — the analog of the reference's GPU-timestamp metric
(PostProcessor.cpp:601-628 measures GPU time around the dispatches, not
host dispatch cost)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
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


if __name__ == "__main__":
    main()

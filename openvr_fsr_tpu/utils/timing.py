"""Timing/profiling harness.

TPU analog of the reference's debug-mode GPU timestamp-query ring
(PostProcessor.h:72-83, PostProcessor.cpp:547-628): measure the device time of
the dispatch with `block_until_ready`, keep a rolling average of 500 frames,
and log "Average GPU processing time for upscale: X ms" at each rollover.
"""

import time

import jax

from .log import get_logger

__all__ = ["GpuTimer", "bench_fn", "hbm_calibration"]


class GpuTimer:
    """Rolling-average frame timer (500-sample window like the reference).

    Logs per-STEREO-PAIR milliseconds. The reference times one single-eye
    dispatch and doubles it (PostProcessor.cpp:621-622); here one measured
    call covers a whole batch, so the per-pair figure is t / pairs with
    pairs supplied by the caller (B/2 for single-eye batches — a B=1
    single-eye call has pairs=0.5, reproducing the reference's x2)."""

    def __init__(self, window=500, scale_for_stereo=False):
        self.window = window
        self.scale_for_stereo = scale_for_stereo  # kept for back-compat
        self.summed = 0.0
        self.count = 0
        self.last_avg_ms = None

    def measure(self, fn, *args, pairs=None):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        # Some remote-TPU transports (axon) ack before device completion;
        # a tiny host transfer is the only reliable fence.
        import numpy as _np
        _ = _np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        if pairs is None:
            pairs = 0.5 if self.scale_for_stereo else 1.0
        self.summed += (time.perf_counter() - t0) / pairs
        self.count += 1
        if self.count >= self.window:
            avg_ms = 1000.0 / self.count * self.summed
            self.last_avg_ms = avg_ms
            get_logger().info(
                "Average GPU processing time for upscale: %.4f ms", avg_ms)
            self.count = 0
            self.summed = 0.0
        return out


def bench_fn(fn, *args, warmup=3, iters=50, profile_dir=None):
    """Time a jitted fn: returns (best_ms, avg_ms). Optionally writes a
    jax.profiler trace."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    ctx = jax.profiler.trace(profile_dir) if profile_dir else _null()
    with ctx:
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
    return min(times) * 1000.0, (sum(times) / len(times)) * 1000.0


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def hbm_calibration(read_shape=(2, 1872, 1792), write_shape=(2, 2492, 2244),
                    n=20, rounds=3):
    """Session HBM rate probe — returns (read_bw, write_bw) in bytes/s.

    The dev tunnel's sustained HBM rates swing ~35% between sessions, so
    every published kernel time is stamped with the same-session memory
    speed-of-light computed from these rates (bench.py / tools/
    bench_paths.py). Probes: a u32 row-reduce (pure read) and a broadcast
    fill (pure write) at the headline working-set shapes, min-of-rounds
    with a host-transfer fence (the axon transport acks early)."""
    import jax.numpy as jnp
    import numpy as np

    def _cal(fn, buf):
        y = fn(buf)
        _ = np.asarray(jnp.ravel(y)[0])
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            for _ in range(n):
                y = fn(buf)
            _ = np.asarray(jnp.ravel(y)[0])
            ts.append((time.perf_counter() - t0) / n)
        return min(ts)

    rbuf = jax.device_put(np.zeros(read_shape, np.uint32))
    wbuf = jnp.zeros(write_shape, jnp.uint32)
    read_bw = rbuf.size * 4 / _cal(
        jax.jit(lambda a: jnp.sum(a, axis=(1, 2))), rbuf)
    write_bw = wbuf.size * 4 / _cal(
        jax.jit(lambda a: jnp.full(write_shape, a[0, 0, 0])), wbuf)
    return read_bw, write_bw

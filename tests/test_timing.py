"""utils/timing — the GPU-timestamp-ring analog (PostProcessor.cpp:547-628)
and the session HBM calibration probe shared by bench.py / bench_paths."""

import jax.numpy as jnp
import numpy as np

from openvr_fsr_tpu.utils.timing import GpuTimer, bench_fn, hbm_calibration


class TestGpuTimer:
    def test_rolling_average_logs_at_window(self):
        # reference: averages <window> samples, logs, restarts the window
        # (PostProcessor.cpp:618-627)
        t = GpuTimer(window=4)
        fn = jnp.asarray
        for _ in range(3):
            t.measure(fn, np.zeros(8, np.float32))
        assert t.last_avg_ms is None and t.count == 3
        t.measure(fn, np.zeros(8, np.float32))
        assert t.last_avg_ms is not None and t.last_avg_ms > 0
        assert t.count == 0 and t.summed == 0.0   # window restarted

    def test_pairs_scaling_matches_reference_x2(self):
        # one B=1 single-eye dispatch counts as half a pair: per-pair time
        # is 2x the measured call (PostProcessor.cpp:621-622)
        t2 = GpuTimer(window=1)
        t2.measure(jnp.asarray, np.zeros(8, np.float32), pairs=0.5)
        t1 = GpuTimer(window=1)
        t1.measure(jnp.asarray, np.zeros(8, np.float32), pairs=1.0)
        assert t2.last_avg_ms > 0 and t1.last_avg_ms > 0

    def test_returns_output(self):
        t = GpuTimer(window=10)
        out = t.measure(lambda x: x + 1, jnp.zeros(4, jnp.float32))
        assert np.asarray(out).sum() == 4


def test_bench_fn_returns_best_and_avg():
    best, avg = bench_fn(jnp.asarray, np.zeros(8, np.float32),
                         warmup=1, iters=3)
    assert 0 < best <= avg


def test_hbm_calibration_smoke():
    # tiny shapes: just pins the probe's contract (positive rates, bytes/s)
    read_bw, write_bw = hbm_calibration(read_shape=(1, 16, 128),
                                        write_shape=(1, 16, 128),
                                        n=2, rounds=1)
    assert read_bw > 0 and write_bw > 0

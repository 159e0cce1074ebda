"""Batched throughput benchmark — the serving-oriented counterpart of
bench.py's latency number.

Runs the flagship fused FSR config (1683x1869 -> 2244x2492 per eye,
renderScale 0.75, sharpness 0.9, radius 0.5) at batch = 8 eyes (4 stereo
pairs) per launch, with zero-copy packed-u32 IO (no u8<->u32 relayout on
either side), and reports stereo pairs/s. Larger batches amortize the
per-launch dispatch cost that dominates small-batch latency on the axon
tunnel (tools/microbench.py launch isolates it).

Usage: python tools/throughput_bench.py [batch_eyes]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from openvr_fsr_tpu import Config, Pipeline

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    h_in, w_in = 1869, 1683
    cfg = Config(enabled=True, render_scale=0.75, sharpness=0.9, radius=0.5)
    pipe = Pipeline(cfg)

    rng = np.random.default_rng(0)
    stacks = [jax.device_put(
        rng.integers(0, 2**32, (B, h_in, w_in), dtype=np.uint32))
        for _ in range(3)]
    eyes = tuple(i % 2 for i in range(B))

    out = pipe.process(stacks[0], eyes=eyes)
    _ = np.asarray(out[0, 0, 0])   # compile + completion
    print(f"[throughput] backend={jax.default_backend()} batch={B} eyes "
          f"out={out.shape} {out.dtype}", flush=True)

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            out = pipe.process(stacks[i % 3], eyes=eyes)
        _ = np.asarray(jnp.sum(out[:, ::373, ::373]))
        return (time.perf_counter() - t0) / n

    run(5)
    sec_per_launch = min(run(20) for _ in range(3))
    pairs = B / 2.0
    pairs_s = pairs / sec_per_launch
    ms_pair = sec_per_launch * 1000.0 / pairs
    mpix = (2244 * 2492 * B) / sec_per_launch / 1e6
    print(f"[throughput] {ms_pair:.3f} ms/pair amortized "
          f"({pairs_s:.1f} pairs/s, {mpix:.0f} Mpix/s)", flush=True)
    import json
    print(json.dumps({
        "metric": "fsr_batch%d_packed_pairs_per_s" % B,
        "value": round(pairs_s, 1), "unit": "pairs/s",
        "ms_per_pair_amortized": round(ms_pair, 4),
        "mpix_per_s": round(mpix, 1)}), flush=True)


if __name__ == "__main__":
    main()

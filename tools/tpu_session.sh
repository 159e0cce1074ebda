#!/bin/sh
# One-shot TPU measurement session — run on a host with the tunnel chip up.
# Regenerates every device artifact in dependency order, logging to
# /tmp/tpu_session/. Prime the oracle cache first (CPU, no device needed):
#   JAX_PLATFORMS=cpu python tools/parity_r03.py --oracle-only
# NVScaler steps compile for minutes; total session ~20-40 min.

set -x
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_session

python bench.py                   2>&1 | tee /tmp/tpu_session/bench.log
python tools/ab_cas.py            2>&1 | tee /tmp/tpu_session/ab_cas.log
python tools/bench_paths.py       2>&1 | tee /tmp/tpu_session/bench_paths.log
python tools/parity_r03.py        2>&1 | tee /tmp/tpu_session/parity.log
python tools/stream_bench.py --seconds 20 --device-resident \
                                  2>&1 | tee /tmp/tpu_session/stream_dev.log
python tools/stream_bench.py --seconds 20 \
                                  2>&1 | tee /tmp/tpu_session/stream_e2e.log
python tools/microbench.py calibrate 2>&1 | tee /tmp/tpu_session/cal.log
python tools/microbench.py overlap   2>&1 | tee /tmp/tpu_session/overlap.log
python tools/bench_8k.py             2>&1 | tee /tmp/tpu_session/bench_8k.log

#!/bin/sh
# One-shot TPU measurement session — run on a host with the tunnel chip up.
# Regenerates every device artifact in dependency order, logging to
# /tmp/tpu_session/. Prime the oracle cache first (CPU, no device needed):
#   JAX_PLATFORMS=cpu python tools/parity.py --oracle-only
# NVScaler steps compile for minutes; total session ~20-40 min.
# `sh tools/tpu_session.sh quick` runs a <15-min priority subset (skips
# everything that compiles NVScaler). Exits non-zero with a count of
# failed steps (plain sh has no pipefail, so each step's status is
# captured before the log tail).

cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_session

# Persistent XLA compilation cache: NVScaler compiles for minutes, and the
# session runs it from several processes (bench_paths, parity, A/B tools).
# The cache works on the axon tunnel backend (verified round 3); compiles
# over the default 1 s threshold are paid once per kernel, not per step.
# Per-user default path: a world-shared /tmp/jax_cache can hit permission
# failures or stale reuse across users on a multi-user host.
JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-${XDG_CACHE_HOME:-$HOME/.cache}/openvr_fsr_tpu/jax_cache}"
export JAX_COMPILATION_CACHE_DIR
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

fails=0

step() {
    name=$1; shift
    echo "== $name: $*"
    "$@" > "/tmp/tpu_session/$name.log" 2>&1
    rc=$?
    tail -20 "/tmp/tpu_session/$name.log"
    if [ $rc -ne 0 ]; then
        echo "== $name FAILED (rc=$rc)"
        fails=$((fails + 1))
    fi
}

if [ "$1" = "quick" ]; then
    step bench        python bench.py
    step ab_cas       python tools/ab_cas.py
    step bench_paths  python tools/bench_paths.py --paths \
        fsr_fused,fsr_supersample,rcas_only,nvsharpen,cas_upscale,cas_sharpen \
        --out BENCH_PATHS_r05.json
    step parity       python tools/parity.py --skip-nis --out PARITY_r05.json
    step overlap      python tools/microbench.py overlap
    step stream_dev   python tools/stream_bench.py --seconds 15 \
        --device-resident --out STREAM_r05.json
    step vpu_audit    python tools/vpu_audit.py --quick --out VPU_AUDIT_r05.json
    step spatial      python tools/spatial_onchip.py
else
    step bench        python bench.py
    step ab_cas       python tools/ab_cas.py
    step bench_paths  python tools/bench_paths.py --out BENCH_PATHS_r05.json
    step parity       python tools/parity.py --out PARITY_r05.json
    step stream_dev   python tools/stream_bench.py --seconds 20 \
        --device-resident --out STREAM_r05.json
    step stream_e2e   python tools/stream_bench.py --seconds 20
    step calibrate    python tools/microbench.py calibrate
    step overlap      python tools/microbench.py overlap
    step bench_8k     python tools/bench_8k.py
    step half         python tools/half_bench.py --out HALF_r05.json
    step vpu_audit    python tools/vpu_audit.py --out VPU_AUDIT_r05.json
    step spatial      python tools/spatial_onchip.py
    step floors       python tools/profile_fsr.py --quick
fi

# README perf prose is generated from the artifacts just written, so the
# docs can never disagree with the session they cite.
step gen_docs     python tools/gen_perf_docs.py

echo "== done: $fails step(s) failed"
exit $fails

#!/bin/sh
# Round-5 follow-up TPU queue: the bf16-tap experiment A/B, the reworked
# floor audits, the 8K sweep retry and the spatial artifact, then doc
# regeneration. One chip, steps strictly sequential. Logs to /tmp/tpu_q/.
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_q
JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-${XDG_CACHE_HOME:-$HOME/.cache}/openvr_fsr_tpu/jax_cache}"
export JAX_COMPILATION_CACHE_DIR
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

fails=0
step() {
    name=$1; shift
    echo "== $name: $*"
    "$@" > "/tmp/tpu_q/$name.log" 2>&1
    rc=$?
    tail -12 "/tmp/tpu_q/$name.log"
    if [ $rc -ne 0 ]; then
        echo "== $name FAILED (rc=$rc)"
        fails=$((fails + 1))
    fi
}

step ab_bf16    python tools/ab_fsr.py mm_bf16_out=True --check --rounds 10
step vpu_audit  python tools/vpu_audit.py --out VPU_AUDIT_r05.json
step bench8k    python tools/bench_8k.py
step spatial    python tools/spatial_onchip.py --out SPATIAL_ONCHIP_r05.json
step nis_audit  python tools/vpu_audit.py --nis --out NIS_AUDIT_r05.json
step gen_docs   python tools/gen_perf_docs.py

echo "== done: $fails step(s) failed"
exit $fails

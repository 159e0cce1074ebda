#!/bin/sh
# Round-5 queue c: re-run the steps queue b left failing — the on-chip
# bitwise check + A/B of the fixed mm_bf16_out (f32 accumulate, explicit
# narrowing convert: Mosaic rejects bf16 matmul accumulators), the two
# floor audits (NaN-pair print crash fixed), then doc regeneration
# (8K error rows now tolerated). One chip, steps strictly sequential.
# Logs to /tmp/tpu_q/.
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
step nis_audit  python tools/vpu_audit.py --nis --out NIS_AUDIT_r05.json
step gen_docs   python tools/gen_perf_docs.py

echo "== done: $fails step(s) failed"
exit $fails

#!/usr/bin/env bash
# Single regenerable "suite is green" entry point (VERDICT r4 item 1).
#
# Runs the quick test subset (CPU, virtual 8-device mesh — the slow e2e
# fits are deselected; `scripts/check.sh --full` runs everything) plus the
# tiny-model bench smoke. Exits non-zero on any failure; paste the tail of
# its output into STATUS.md rather than hand-writing a claim.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
if [ "${1:-}" = "--full" ]; then
    python -m pytest tests/ -q
else
    python -m pytest tests/ -q -m "not slow"
fi
rc_tests=$?

echo "== bench smoke (tiny model, CPU) =="
SSDT_BENCH_TINY=1 JAX_PLATFORMS=cpu python bench.py
rc_bench=$?

echo "== check.sh summary =="
echo "pytest rc=$rc_tests  bench-smoke rc=$rc_bench"
exit $(( rc_tests || rc_bench ))

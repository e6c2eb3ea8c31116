#!/usr/bin/env bash
# CI runner: quick -> not-slow -> full tiers with per-tier timeouts,
# asserting the pytest summary line each time (VERDICT r3 next #9).
#
# Usage:
#   scripts/ci.sh                # all three tiers
#   scripts/ci.sh quick          # one tier: quick | notslow | full
#
# Timeouts are per tier and generous for a cold jit cache on a 1-CPU
# host (measured: quick ~3 min, not-slow ~12 min, full ~35 min cold).
# The suite itself runs WITHOUT a persistent compile cache (see
# tests/conftest.py: jaxlib 0.9.0 XLA:CPU (de)serialization segfaults
# under process load), so wall times are dominated by XLA host
# compiles and scale with available cores.
#
# Exit code: 0 iff every requested tier printed "N passed" with no
# failures/errors within its timeout.

set -u
cd "$(dirname "$0")/.."

TIER="${1:-all}"
FAILED=0

run_tier() {
    local name="$1" timeout_s="$2"; shift 2
    local log
    log="$(mktemp /tmp/ci_${name}_XXXX.log)"
    echo "=== tier: ${name} (timeout ${timeout_s}s) $*"
    local t0 rc
    t0=$(date +%s)
    timeout "${timeout_s}" python -m pytest "$@" 2>&1 | tee "${log}" \
        | tail -2
    rc=${PIPESTATUS[0]}
    local dt=$(( $(date +%s) - t0 ))
    # the summary line must exist and report no failures
    local summary
    summary=$(grep -E "^[0-9]+ passed" "${log}" | tail -1)
    if [[ ${rc} -ne 0 || -z "${summary}" ]] \
        || grep -qE "[0-9]+ (failed|error)" "${log}"; then
        echo "!!! tier ${name} FAILED (rc=${rc}, ${dt}s): ${summary:-no summary line}"
        FAILED=1
    else
        echo ">>> tier ${name} ok (${dt}s): ${summary}"
    fi
    rm -f "${log}"
}

case "${TIER}" in
    quick)   run_tier quick   600  -m quick -q ;;
    notslow) run_tier notslow 1800 -m "not slow" -q ;;
    full)    run_tier full    4500 -q ;;
    all)
        run_tier quick   600  -m quick -q
        run_tier notslow 1800 -m "not slow" -q
        run_tier full    4500 -q
        ;;
    *) echo "unknown tier '${TIER}' (quick|notslow|full|all)"; exit 2 ;;
esac

exit ${FAILED}

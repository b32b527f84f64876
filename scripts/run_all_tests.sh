#!/usr/bin/env bash
# Full test routine: default tier (parallel via xdist when available) followed
# by the slow tier (end-to-end CLI pipelines, sharded-kernel grad parity,
# convergence). Run at least once per round so the slow tests don't rot
# between judge reviews (VERDICT r2 item 8).
#
# Usage: scripts/run_all_tests.sh [extra pytest args...]
set -uo pipefail
cd "$(dirname "$0")/.."

XDIST=()
if python -c "import xdist" 2>/dev/null; then
    XDIST=(-n 2)
fi

echo "=== default tier ==="
python -m pytest tests/ -q "${XDIST[@]}" "$@"
rc1=$?

echo "=== slow tier ==="
python -m pytest tests/ -q -m slow "${XDIST[@]}" "$@"
rc2=$?

if [ $rc1 -ne 0 ] || [ $rc2 -ne 0 ]; then
    echo "FAILED (default=$rc1 slow=$rc2)"
    exit 1
fi
echo "ALL GREEN (default + slow)"

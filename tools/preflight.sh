#!/bin/sh
# End-of-round preflight (VERDICT r7 "Next" #8): run the FULL test
# suite and require a clean working tree immediately before the
# end-of-round snapshot commit, so the judged tree is provably
# green+clean. Exit 0 only when both hold.
#
# Usage: sh tools/preflight.sh        (from the repo root)
set -e
cd "$(dirname "$0")/.."

echo "== preflight: pytest tests/ (incl. SPARK_GRAFT_SLOW sweeps) =="
SPARK_GRAFT_SLOW=1 python -m pytest tests/ -q

echo "== preflight: git status --short (must be empty) =="
STATUS="$(git status --short)"
if [ -n "$STATUS" ]; then
    echo "DIRTY TREE:"
    echo "$STATUS"
    echo "commit or clean the above before the snapshot"
    exit 1
fi
echo "preflight OK: tests green, tree clean"

#!/bin/bash
# Task-retry determinism gate: run graft.RetryChaos (retry-enabled
# local[8,3] context, FaultInject in the input lineage) and write the
# round artifact. Usage: tools/retry_chaos.sh [sfDir] [out.json]
set -e
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-RETRYCHAOS.json}"
tools/run.sh graft.RetryChaos "$SF" 2>/dev/null | grep '^{' | tail -1 > "$OUT"
cat "$OUT"
python3 -c "import json,sys; sys.exit(0 if json.load(open('$OUT'))['pass'] else 1)"

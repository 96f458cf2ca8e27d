#!/bin/bash
# ×10-scale bench gate (VERDICT r14 item 6): amplify sf0.1 ×10 to a
# FIXED scratch path (the "# sf=" key BENCH_REF_x10.txt is recorded
# under — amplification is deterministic, so the fixture is
# reproducible), run the full query surface minus the two
# DECLARED-quadratic verification queries (q_embed_neardup embeds an
# all-pairs brute baseline in its own output; its lsh twin verifies
# against one — ×100 at ×10 data by construction, the same exclusion
# ScaleSmoke documents), and write the detail to BENCH_DETAIL_x10.json.
#
# First run (or after a verdict-accepted plan change):
#   tools/bench_x10.sh && python3 tools/regen_bench_ref.py \
#     BENCH_DETAIL_x10.json BENCH_REF_x10.txt
# Gate run (any later round): tools/bench_x10.sh — the printed headline
# JSON carries per-query regressions against BENCH_REF_x10.txt.
set -e
cd "$(dirname "$0")/.."
DIR=${1:-/tmp/graft-x10-sf0.1}
if [ ! -d "$DIR/lineitem.parquet" ]; then
  echo "materializing x10 fixture at $DIR" >&2
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=10 \
    SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    tools/run.sh graft.ScaleSmoke --amplify "$DIR"
fi
SPARK_GRAFT_SF_DIR="$DIR" \
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_EXCLUDE=q_embed_neardup,q_embed_neardup_lsh \
  SPARK_GRAFT_BENCH_DETAIL_OUT=BENCH_DETAIL_x10.json \
  tools/run.sh graft.Bench

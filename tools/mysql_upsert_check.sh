#!/usr/bin/env bash
# Gated integration check for JdbcSource.upsertWrite's MySQL dialect
# (INSERT ... ON DUPLICATE KEY UPDATE) — the one codepath the offline
# sandbox cannot exercise (the ANSI/Derby MERGE dialect is spec-covered).
#
# Requires a live MySQL and its JDBC driver on the classpath:
#   export GRAFT_MYSQL_URL=jdbc:mysql://host:3306/db
#   export GRAFT_MYSQL_USER=... GRAFT_MYSQL_PASSWORD=...
#   export GRAFT_MYSQL_DRIVER_JAR=/path/to/mysql-connector-j.jar
#   tools/mysql_upsert_check.sh
set -euo pipefail
if [[ -z "${GRAFT_MYSQL_URL:-}" ]]; then
  echo "SKIP: GRAFT_MYSQL_URL not set (this check needs a live MySQL)" >&2
  exit 0
fi
cd "$(dirname "$0")/.."
EXTRA_CP="${GRAFT_MYSQL_DRIVER_JAR:-}" tools/run.sh graft.MySqlUpsertCheck

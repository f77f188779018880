#!/usr/bin/env bash
# CI recipe — the engine's analog of the reference's lint-on-every-push
# workflow (shellcheck.yml:17): compile, full test suite, then the
# sf0.001 end-to-end Verify smoke (every declared query executes and
# writes its result parquet; the DuckDB oracle compare is the driver's
# sf0.01 job, but tools/check_oracle.py runs here too when duckdb is
# available).
#
# Usage: tools/ci.sh [testdata-dir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="$(mktemp -d /tmp/graft_ci_verify.XXXXXX)"
trap 'rm -rf "$OUT_DIR"' EXIT

echo "== ci: compile =="
sbt -batch compile

echo "== ci: test =="
sbt -batch test

echo "== ci: verify smoke @ $SF_DIR =="
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"
# every declared query must have produced a result
n_out=$(find "$OUT_DIR" -maxdepth 1 -name 'q_*.parquet' | wc -l)
echo "== ci: $n_out query results written =="
[ "$n_out" -gt 0 ] || { echo "ci: Verify wrote no results" >&2; exit 1; }

# oracle compare when the driver-side toolchain is present (optional
# in minimal CI images; the correctness gate proper runs it at sf0.01)
if python3 -c 'import duckdb, pyarrow' 2>/dev/null; then
  echo "== ci: oracle compare =="
  python3 tools/check_oracle.py "$SF_DIR" "$OUT_DIR"
else
  echo "== ci: duckdb/pyarrow unavailable — oracle compare skipped =="
fi

echo "== ci: PASS =="

#!/bin/bash
# Full-registry hostile gate (round 14): rebuild the adversarial
# fixture, run EVERY registered query on it, hash-compare with DuckDB.
#
#   tools/hostile_gate.sh [SRC_SF_DIR] [ONLY]
#
# SRC_SF_DIR defaults to /root/testdata/sf0.001; ONLY (optional) is a
# comma list passed through as SPARK_GRAFT_ONLY for a focused run.
# Expect "0 failures": every declared oracle must bit-match on the
# whitespace/media/markup/repetition hostility, not just driver soup.
set -euo pipefail
cd "$(dirname "$0")/.."
SRC="${1:-/root/testdata/sf0.001}"
FIX=/tmp/graft-hostile
OUT=/tmp/graft-hostile-verify
# stale outputs from a prior run would mask an errored query as a
# value mismatch (observed r15: raise_error'd media queries compared
# against r14 leftovers) — always start clean
rm -rf "$OUT"
python3 tools/make_hostile_fixture.py "$SRC" "$FIX"
if [ -n "${2:-}" ]; then
  SPARK_GRAFT_CPUS=8 SPARK_GRAFT_ONLY="$2" sbt -batch "runMain graft.Verify $FIX $OUT"
else
  SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify $FIX $OUT"
fi
python3 tools/compare_oracle.py "$OUT" "$FIX"

#!/bin/bash
# Cold-start operations profile (the r12-r14 queue item, settled in
# r15): one representative query per operator family, each in a FRESH
# JVM with NO warmup — session spin-up + time-to-first-result, written
# to COLDSTART.json. Deliberately NOT a SparkEntry query: cold
# wall-clock is neither oracle- nor rows-stable, so it rides this
# operations artifact instead of the correctness gate.
#
#   tools/coldstart_profile.sh [OUT_JSON] [SF_DIR] [CPUS]
# Defaults: COLDSTART.json /root/testdata/sf0.1 32
#
# Run on a QUIET machine (same rule as the bench): cold numbers are
# load-sensitive, and the artifact is a profile, not a gate.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-COLDSTART.json}"
SF="${2:-/root/testdata/sf0.1}"
CPUS="${3:-32}"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.ColdStart $OUT"
echo "cold-start profile -> $OUT"

#!/usr/bin/env bash
# Pre-snapshot gate: the end-of-round snapshot must be cut from a tree
# whose FULL test suite and FULL oracle sweep are green — round 13's
# snapshot shipped untested changes (a half-updated test) because the
# "all green" run predated the final commits. Run this AFTER the last
# source change and BEFORE the snapshot commit; it appends a timestamped,
# commit-anchored record to ROUND_NOTES.md only when everything passes.
#
# Usage: tools/presnapshot.sh [sf-dir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/presnapshot.XXXXXX)
echo "[presnapshot] full sbt test..."
sbt -batch test 2>&1 | tee "$OUT/test.log" | grep -E "Tests:|All tests|\*\*\* FAILED" | tail -3
grep -q "All tests passed." "$OUT/test.log" || {
  echo "[presnapshot] RED: sbt test failed — NOT snapshot-ready"; exit 1; }
echo "[presnapshot] full oracle sweep at $SF..."
sbt -batch "runMain graft.Verify $SF $OUT/verify" >"$OUT/verify.log" 2>&1 || {
  echo "[presnapshot] RED: graft.Verify crashed (see $OUT/verify.log)"; exit 1; }
python3 tools/check.py "$SF" "$OUT/verify" | tee "$OUT/check.log" | tail -3
grep -q "ALL GREEN" "$OUT/check.log" || {
  echo "[presnapshot] RED: oracle compare failed — NOT snapshot-ready"; exit 1; }
TESTS=$(grep -oE "Tests: succeeded [0-9]+" "$OUT/test.log" | tail -1 | grep -oE "[0-9]+")
GATES=$(grep -cE "^ok " "$OUT/check.log" || true)
STAMP=$(date -u +"%Y-%m-%dT%H:%M:%SZ")
HEAD_SHA=$(git rev-parse --short HEAD)
DIRTY=$(git status --porcelain | wc -l)
{
  echo ""
  echo "## Pre-snapshot gate: GREEN at $STAMP"
  echo ""
  echo "- tree: HEAD=$HEAD_SHA, uncommitted files: $DIRTY"
  echo "- sbt test: $TESTS tests, all passed (final tree)"
  echo "- oracle sweep ($SF): $GATES gates ALL GREEN via tools/check.py"
} >> ROUND_NOTES.md
echo "[presnapshot] GREEN — recorded in ROUND_NOTES.md (HEAD=$HEAD_SHA, $TESTS tests)"

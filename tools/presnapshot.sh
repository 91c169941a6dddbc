#!/usr/bin/env bash
# Pre-snapshot gate: the end-of-round snapshot must be cut from a tree
# whose FULL test suite and FULL oracle sweep are green — round 13's
# snapshot shipped untested changes (a half-updated test) because the
# "all green" run predated the final commits. Run this AFTER the last
# source change and BEFORE the snapshot commit; it appends a timestamped,
# commit-anchored record to ROUND_NOTES.md only when everything passes.
#
# Exit-status discipline: every failing step prints its own RED line and
# the log path BEFORE exiting — no bare `cmd | grep` pipelines on the
# critical path, which under `set -euo pipefail` would abort the script
# before the diagnostic.
#
# Usage: tools/presnapshot.sh [sf-dir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT=$(mktemp -d /tmp/presnapshot.XXXXXX)

echo "[presnapshot] full sbt test (log: $OUT/test.log)..."
if ! sbt -batch test >"$OUT/test.log" 2>&1; then
  tail -20 "$OUT/test.log" || true
  echo "[presnapshot] RED: sbt test failed — NOT snapshot-ready ($OUT/test.log)"
  exit 1
fi
if ! grep -q "All tests passed." "$OUT/test.log"; then
  echo "[presnapshot] RED: sbt exited 0 but no 'All tests passed.' marker" \
       "— inspect $OUT/test.log before snapshotting"
  exit 1
fi
grep -E "Tests: succeeded" "$OUT/test.log" | tail -1 || true

echo "[presnapshot] full oracle sweep at $SF (log: $OUT/verify.log)..."
if ! sbt -batch "runMain graft.Verify $SF $OUT/verify" >"$OUT/verify.log" 2>&1; then
  tail -20 "$OUT/verify.log" || true
  echo "[presnapshot] RED: graft.Verify crashed ($OUT/verify.log)"
  exit 1
fi
if ! python3 tools/check.py "$SF" "$OUT/verify" >"$OUT/check.log" 2>&1; then
  tail -10 "$OUT/check.log" || true
  echo "[presnapshot] RED: oracle compare failed — NOT snapshot-ready ($OUT/check.log)"
  exit 1
fi
if ! grep -q "ALL GREEN" "$OUT/check.log"; then
  tail -10 "$OUT/check.log" || true
  echo "[presnapshot] RED: check.py exited 0 without ALL GREEN ($OUT/check.log)"
  exit 1
fi

echo "[presnapshot] bench artifact sentinel check..."
# graft.Bench writes bench.json into the CWD as a side effect — a stray
# (possibly sentinel-flagged) working-tree copy must not shadow the
# committed artifact, and an uncommitted clean one must be committed
# before the record pins its hash
if ! git diff --quiet -- bench.json; then
  echo "[presnapshot] RED: working-tree bench.json differs from HEAD" \
       "(graft.Bench writes into the CWD) — commit the intended artifact" \
       "or 'git checkout -- bench.json' first"
  exit 1
fi
# Round-14 lesson: the final commit replaced a clean bench.json with a
# sentinel-flagged run while its message claimed "artifact unchanged".
# The gate now refuses to go green over a flagged artifact, and records
# the artifact's hash so any later replacement diffs against the record.
if ! python3 - <<'PYEOF'
import json, sys
d = json.load(open("bench.json"))
bad = d.get("noisy_sections") or []
if bad or d.get("noisy_host"):
    print("[presnapshot] RED: committed bench.json is a sentinel-flagged run "
          f"(noisy_sections={bad}, noisy_host={d.get('noisy_host')}) — "
          "re-run graft.Bench on an idle host and commit the clean artifact")
    sys.exit(1)
PYEOF
then
  exit 1
fi
BENCH_SHA=$(sha256sum bench.json | cut -c1-12)
# Round-17 lesson (VERDICT "What's wrong" #1): the final commit of the
# round REPLACED the gate-pinned clean bench.json with a rejected
# contended-start run while its own notes claimed the committed one
# stood. The artifact a gate record pins is part of the record: a later
# bench.json may only differ from the LAST pinned sha if ROUND_NOTES.md
# carries an explicit "Bench supersede: <sha12>" entry naming the new
# artifact. First gate of a round (no prior record in ROUND_NOTES.md)
# pins freely.
LAST_PIN=$(grep -oE "bench.json: sha256 [0-9a-f]{12}" ROUND_NOTES.md | tail -1 | grep -oE "[0-9a-f]{12}$" || true)
if [ -n "$LAST_PIN" ] && [ "$BENCH_SHA" != "$LAST_PIN" ]; then
  if ! grep -qE "Bench supersede: $BENCH_SHA" ROUND_NOTES.md; then
    echo "[presnapshot] RED: bench.json sha $BENCH_SHA differs from the last" \
         "gate-pinned sha $LAST_PIN and ROUND_NOTES.md has no" \
         "'Bench supersede: $BENCH_SHA' entry — restore the pinned artifact" \
         "or record an explicit supersede for the new one"
    exit 1
  fi
  echo "[presnapshot] bench.json supersede acknowledged ($LAST_PIN -> $BENCH_SHA)"
fi

TESTS=$(grep -oE "Tests: succeeded [0-9]+" "$OUT/test.log" | tail -1 | grep -oE "[0-9]+" || echo "?")
# grep -c prints the 0 itself before exiting nonzero — '|| true', not a
# fallback echo, or GATES becomes the two-line string "0\n?"
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
  echo "- bench.json: sha256 $BENCH_SHA…, sentinel-clean (noisy_sections: [])"
} >> ROUND_NOTES.md
echo "[presnapshot] GREEN — recorded in ROUND_NOTES.md (HEAD=$HEAD_SHA, $TESTS tests, $GATES gates)"

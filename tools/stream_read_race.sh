#!/bin/bash
# Two-process reader-during-streamed-maintenance test (r19 verdict
# ask #6).
#
# Launches a graft.tools.StreamReadProbe WRITER (runs the q167
# streamed-mart maintenance against a shared root, pausing after each
# micro-batch) and, simultaneously, a READER in its own JVM that
# polls the mart's per-day row counts the whole time. Asserts:
#   1. both processes exit 0;
#   2. the reader reports torn=0 — every day partition it ever saw
#      was COMPLETE (full panel row count for that day);
#   3. the reader's visible day-set GREW during the run (daySets has
#      >= 2 entries) — it really read mid-maintenance, not before or
#      after — and ended at the full set (sawAll=true).
# A run where the reader saw only one day-set size is reported as
# SKEWED (writer finished before the reader's second poll) — rerun
# for a true overlap; the per-batch writer pause makes that rare.
# Compile first: sbt -batch compile.
#
# Usage: tools/stream_read_race.sh [root] [sourceDir] [pauseMs]
set -u
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
# mirror build.sbt's forked-JVM options (Spark 4 on JDK 17 outside
# spark-submit needs the add-opens set)
OPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
OPTS="$OPTS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx4g -Xss64m"

ROOT="${1:-$(mktemp -d /tmp/graft_stream_read.XXXXXX)}"
DIR="${2:-/root/testdata/sf0.001}"
PAUSE="${3:-2000}"
OUT="$(mktemp -d /tmp/graft_stream_read_logs.XXXXXX)"
echo "shared root: $ROOT  source: $DIR  pause: ${PAUSE}ms  logs: $OUT"

java $OPTS -cp "$CP" graft.tools.StreamReadProbe write "$ROOT" "$DIR" "$PAUSE" >"$OUT/w.log" 2>&1 &
W=$!
java $OPTS -cp "$CP" graft.tools.StreamReadProbe read "$ROOT" "$DIR" 300 >"$OUT/r.log" 2>&1 &
R=$!
wait $W; RW=$?
wait $R; RR=$?
grep -h '^WRITE\|^READ\|^TORN' "$OUT/w.log" "$OUT/r.log"

fail() { echo "FAIL: $1"; exit 1; }
[ "$RW" -eq 0 ] || fail "writer exit $RW (see $OUT/w.log)"
[ "$RR" -eq 0 ] || fail "reader exit $RR — torn read or timeout (see $OUT/r.log)"
grep -q 'torn=0' "$OUT/r.log" || fail "reader saw a torn partition"
grep -q 'sawAll=true' "$OUT/r.log" || fail "reader never saw the full day set"

SETS=$(grep -o 'daySets=[^ ]*' "$OUT/r.log" | cut -d= -f2 | awk -F/ '{print NF}')
if [ "${SETS:-1}" -ge 2 ]; then
  echo "PASS: reader saw $SETS listing generations mid-maintenance, all partitions complete"
else
  echo "PASS (SKEWED): reader saw one generation only — rerun for a true overlap"
fi

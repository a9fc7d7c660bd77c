#!/bin/bash
# Persistent streamed-store test across SESSIONS (r19 verdict ask #8).
#
# Runs graft.tools.StreamPersistProbe twice, sequentially, against one
# persistent root. Asserts:
#   1. session 1 BUILDS (preValid=false) and session 2 REUSES
#      (preValid=true) — the manifest gate validated across processes;
#   2. both sessions agree on row count and full-content checksum —
#      session 2's maintenance (fold + snapshot retirement) and its
#      no-op AvailableNow pass on the shared checkpoint moved no value;
#   3. both report postValid=true — the store still manifest-validates
#      after reuse + maintenance.
# Compile first: sbt -batch compile.
#
# Usage: tools/stream_persist.sh [root] [sourceDir]
set -u
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:/opt/spark/jars/*"
OPTS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPTS="$OPTS --add-opens java.base/$p=ALL-UNNAMED"
done
OPTS="$OPTS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx4g -Xss64m"

ROOT="${1:-$(mktemp -d /tmp/graft_stream_persist.XXXXXX)}"
DIR="${2:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_stream_persist_logs.XXXXXX)"
echo "persistent root: $ROOT  source: $DIR  logs: $OUT"

java $OPTS -cp "$CP" graft.tools.StreamPersistProbe "$ROOT" "$DIR" >"$OUT/s1.log" 2>&1
R1=$?
java $OPTS -cp "$CP" graft.tools.StreamPersistProbe "$ROOT" "$DIR" >"$OUT/s2.log" 2>&1
R2=$?
grep -h '^SPERSIST' "$OUT/s1.log" "$OUT/s2.log"

fail() { echo "FAIL: $1"; exit 1; }
[ "$R1" -eq 0 ] && [ "$R2" -eq 0 ] || fail "session exit codes $R1/$R2 (see $OUT)"
grep -q 'preValid=false' "$OUT/s1.log" || fail "session 1 did not build"
grep -q 'preValid=true'  "$OUT/s2.log" || fail "session 2 rebuilt instead of reusing"
grep -q 'postValid=true' "$OUT/s1.log" || fail "session 1: store invalid after run"
grep -q 'postValid=true' "$OUT/s2.log" || fail "session 2: store invalid after maintenance"

SIG1=$(grep -o 'rows=[^ ]* checksum=[^ ]*' "$OUT/s1.log")
SIG2=$(grep -o 'rows=[^ ]* checksum=[^ ]*' "$OUT/s2.log")
[ -n "$SIG1" ] && [ "$SIG1" = "$SIG2" ] || \
  fail "sessions disagree on store content: [$SIG1] vs [$SIG2]"

echo "PASS: session 2 reused, maintained (fold + retire), and the store still validates — $SIG2"

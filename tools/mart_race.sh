#!/bin/bash
# Two-process mart-publication race test (r17 verdict ask #8).
#
# Launches two graft.tools.MartRaceProbe JVMs SIMULTANEOUSLY against
# one persistent mart root: both derive the value-family mart, both
# attempt temp-sibling + ATOMIC_MOVE publication, one wins, the loser
# must validate the winner's mart and discard its own copy. Asserts:
#   1. both probes exit 0 and report postValid=true;
#   2. both agree on the published path, row count and a full-content
#      checksum (no partial read — a torn mart cannot checksum equal);
#   3. no orphaned *.tmp-* build directories survive under the root;
#   4. a third (sequential) probe REUSES the published mart
#      (preValid=true) instead of rebuilding.
# A degenerate run (one probe started late and reused instead of
# building) is reported as SKEWED, not a failure — rerun for a true
# race; in practice simultaneous starts always overlap the multi-
# second derive. Compile first: sbt -batch compile.
#
# Usage: tools/mart_race.sh [martRoot] [sourceDir] [dataset]
#   dataset: any MartDataset name (alphas|technical|ema|momentum|value|
#   sentiment), default value; `alphas` is the expensive build where a
#   raced double-build hurts most.
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

ROOT="${1:-$(mktemp -d /tmp/graft_mart_race.XXXXXX)}"
DIR="${2:-/root/testdata/sf0.001}"
DS="${3:-value}"
OUT="$(mktemp -d /tmp/graft_mart_race_logs.XXXXXX)"
echo "race root: $ROOT  source: $DIR  dataset: $DS  logs: $OUT"

java $OPTS -cp "$CP" graft.tools.MartRaceProbe "$ROOT" "$DIR" "$DS" >"$OUT/a.log" 2>&1 &
A=$!
java $OPTS -cp "$CP" graft.tools.MartRaceProbe "$ROOT" "$DIR" "$DS" >"$OUT/b.log" 2>&1 &
B=$!
wait $A; RA=$?
wait $B; RB=$?
grep -h '^RACE' "$OUT/a.log" "$OUT/b.log"

fail() { echo "FAIL: $1"; exit 1; }
[ "$RA" -eq 0 ] && [ "$RB" -eq 0 ] || fail "probe exit codes $RA/$RB (see $OUT)"
grep -q 'postValid=true' "$OUT/a.log" || fail "probe A: mart invalid after race"
grep -q 'postValid=true' "$OUT/b.log" || fail "probe B: mart invalid after race"

TMPS=$(find "$ROOT" -maxdepth 1 -name '*.tmp-*' | wc -l)
[ "$TMPS" -eq 0 ] || fail "$TMPS orphaned temp mart dir(s) under $ROOT"

SIG_A=$(grep -o 'path=[^ ]* rows=[^ ]* checksum=[^ ]*' "$OUT/a.log")
SIG_B=$(grep -o 'path=[^ ]* rows=[^ ]* checksum=[^ ]*' "$OUT/b.log")
[ -n "$SIG_A" ] && [ "$SIG_A" = "$SIG_B" ] || \
  fail "probes disagree on published mart: [$SIG_A] vs [$SIG_B]"

# exactly one published mart dir under the root
NDIRS=$(find "$ROOT" -mindepth 1 -maxdepth 1 -type d | wc -l)
[ "$NDIRS" -eq 1 ] || fail "expected 1 published mart dir, found $NDIRS"

# third, sequential probe: must take the reuse fast path
java $OPTS -cp "$CP" graft.tools.MartRaceProbe "$ROOT" "$DIR" "$DS" >"$OUT/c.log" 2>&1 \
  || fail "third probe failed (see $OUT/c.log)"
grep -h '^RACE' "$OUT/c.log"
grep -q 'preValid=true' "$OUT/c.log" || fail "third probe rebuilt instead of reusing"

BUILT=$(cat "$OUT/a.log" "$OUT/b.log" | grep -c 'preValid=false')
if [ "$BUILT" -eq 2 ]; then
  echo "PASS: true two-builder race — one winner, loser discarded, third run reused"
else
  echo "PASS (SKEWED): only $BUILT probe(s) built — rerun for a true race"
fi

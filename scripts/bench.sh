#!/usr/bin/env bash
# Benchmark entry point that escapes sbt entirely.
#
# Eight rounds of BENCH artifacts failed to parse because sbt prints
# "[success] Total time: ..." AFTER graft.Bench's summary JSON, so the
# last stdout line was never JSON. This script launches graft.Bench
# with plain `java -cp` (compiled classes + the image's Spark jars),
# making Bench's final summary object the genuinely last stdout line.
# Spark/log4j noise goes to stderr (captured in target/bench-stderr.log
# for diagnosis) so a combined-stream capture stays clean too.
#
# Usage:
#   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."

CLASSES=target/scala-2.13/classes
# (Re)compile quietly; all sbt chatter to stderr so stdout is Bench-only.
sbt -batch compile 1>&2

# Matches build.sbt's javaOptions: Spark 4.x on JDK 17 outside
# spark-submit needs the module opens that the launcher normally injects.
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=("--add-opens" "java.base/$p=ALL-UNNAMED")
done

exec java \
  "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "-Xmx${SPARK_DRIVER_MEM:-24g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench \
  2>target/bench-stderr.log

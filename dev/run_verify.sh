#!/bin/bash
# Launch graft.Verify outside sbt (no sbt lock, survives long sweeps).
# Usage: dev/run_verify.sh <sfDir> <outDir> [heapGiB]
# Env: SPARK_GRAFT_CPUS (defaults to all cores), SPARK_GRAFT_ONLY (csv filter)
set -euo pipefail
cd "$(dirname "$0")/.."
HEAP="${3:-80}"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
exec java -Xmx"${HEAP}g" $OPENS \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$1" "$2"

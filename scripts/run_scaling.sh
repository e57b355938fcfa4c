#!/usr/bin/env bash
# Launch graft.ScalingBench WITHOUT holding the sbt server/target lock:
# plain java over the compiled classes + the unmanaged Spark jars. The
# bench spawns its own taskset-pinned child JVMs; the parent only
# orchestrates (and materializes the corpus once, untimed).
# Usage: scripts/run_scaling.sh [nDocs] [N]
set -euo pipefail
cd "$(dirname "$0")/.."
NDOCS="${1:-200000}"
N="${2:-2}"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=("--add-opens" "java.base/$p=ALL-UNNAMED")
done
exec java "${ADD_OPENS[@]}" -Xmx8g -Dspark.ui.enabled=false \
  -cp "$CP" graft.ScalingBench "$NDOCS" "$N"

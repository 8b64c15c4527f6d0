#!/bin/bash
# Run a graft main from the frozen jar snapshot (/tmp/graft-soak.jar),
# isolated from sbt recompiles — long soak/bench JVMs load classes
# lazily, so running them off target/classes while editing corrupts
# them mid-flight. Usage: tools/run_main.sh graft.ScaleSoak args...
# Refresh the snapshot with: sbt package && cp target/scala-2.13/*.jar
# /tmp/graft-soak.jar
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "/tmp/graft-soak.jar:/opt/spark/jars/*" \
  "$@"

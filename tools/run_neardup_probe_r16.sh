#!/bin/bash
# Targeted quiet-window probe for dd_neardup,dd_neardup_ingest at the factor-100
# replica (reps=3) — the isolated leg of the in-suite vs isolated gap
# attribution the r15 verdict demanded (watch item #1). Footprint
# telemetry rides along in the full JSON, so if the isolated run moves
# the same shuffle bytes as the in-suite leg the gap is environmental
# (shuffle I/O contention under suite pressure), not algorithmic.
cd /root/repo || exit 1
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"

SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY=dd_neardup,dd_neardup_ingest \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_neardup_probe_r16.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_neardup_probe_r16.stdout 2> /tmp/bench_neardup_probe_r16.stderr
echo "NEARDUP_PROBE EXIT $?" >> /tmp/sweep_r16.status

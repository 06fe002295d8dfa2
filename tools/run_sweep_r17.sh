#!/bin/bash
# Round-17 scaling sweep at the frozen round-17 query surface (the r16
# protocol: launched detached AFTER all compiles/tests, and nothing else
# may touch sbt or the classes dir until /tmp/sweep_r17.status reads
# DONE2 — a mid-run recompile shifts lazily-loaded lambda classes under
# the running measurement JVM).
cd /root/repo || exit 1
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_base_r17.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_base_r17.stdout 2> /tmp/bench_base_r17.stderr
echo "BASE2 EXIT $?" >> /tmp/sweep_r17.status

SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_100x_r17.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_100x_r17.stdout 2> /tmp/bench_100x_r17.stderr
echo "SF10_2 EXIT $?" >> /tmp/sweep_r17.status
echo "DONE2" >> /tmp/sweep_r17.status

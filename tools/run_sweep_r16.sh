#!/bin/bash
# Round-16 scaling sweep driver: full suite at base sf0.1 and at the
# factor-100 replica (target/sf10), reps=2, full JSON (incl. per-query
# shuffle/spill telemetry) to /tmp. Detached via nohup so it survives the
# invoking shell; progress greppable from the stderr logs.
cd /root/repo || exit 1
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_base_r16.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_base_r16.stdout 2> /tmp/bench_base_r16.stderr
echo "BASE EXIT $?" >> /tmp/sweep_r16.status

SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_OUT=/tmp/bench_100x_r16.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_100x_r16.stdout 2> /tmp/bench_100x_r16.stderr
echo "SF10 EXIT $?" >> /tmp/sweep_r16.status
echo "DONE" >> /tmp/sweep_r16.status

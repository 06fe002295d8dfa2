#!/bin/bash
# Round-17 FULL-SURFACE cluster leg (r16 verdict item 4): every declared
# query timed on local-cluster[2,4,8192] (real executor JVMs, serialized
# network shuffle) and then on local[8] with the same core count, reps=2,
# min across passes — the serialization-only failure class (the
# SerializedLambda lesson) can only hide in queries that never run under
# real executor transport. Launched detached AFTER all compiles/tests;
# nothing may touch sbt or the classes dir until /tmp/cluster_r17.status
# reads DONE.
cd /root/repo || exit 1
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"

SPARK_GRAFT_CLUSTER_QUERIES=ALL SPARK_GRAFT_BENCH_REPS=2 \
  java $AO -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.tools.ClusterCheck bench /root/testdata/sf0.1 \
  /root/repo/bench_cluster_r17.json \
  > /tmp/cluster_r17.stdout 2> /tmp/cluster_r17.stderr
echo "BENCH EXIT $?" >> /tmp/cluster_r17.status
echo "DONE" >> /tmp/cluster_r17.status

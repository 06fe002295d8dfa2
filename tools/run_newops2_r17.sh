#!/bin/bash
# Round-17 second-batch per-op measurement chain for the five ops landed
# after the round's frozen sweep (q_k_anonymity, ev_power_analysis,
# sim_silhouette, txt_yield_curve, dd_bow_dedup): rebuild the factor-100
# replica, run base + 100x per-op legs, then the cluster-vs-local leg —
# the same protocol the first post-freeze batch used. Launched detached
# AFTER the final compile; nothing may touch sbt or
# target/scala-2.13/classes until /tmp/newops2_r17.status reads ALLDONE.
cd /root/repo || exit 1
: > /tmp/newops2_r17.status
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
OPS="dd_bow_dedup,ev_power_analysis,q_k_anonymity,sim_silhouette,txt_yield_curve"

if [ ! -d target/sf10 ]; then
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf10 100 \
    > /tmp/scaleup_newops2.stdout 2> /tmp/scaleup_newops2.stderr
  echo "SCALEUP EXIT $?" >> /tmp/newops2_r17.status
fi

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY=$OPS \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_newops2_base.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_newops2_base.stdout 2> /tmp/bench_newops2_base.stderr
echo "BASE EXIT $?" >> /tmp/newops2_r17.status

SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 SPARK_GRAFT_CPUS=32 \
SPARK_GRAFT_BENCH_REPS=2 SPARK_GRAFT_BENCH_ONLY=$OPS \
SPARK_GRAFT_BENCH_OUT=/tmp/bench_newops2_100x.json \
  java $AO -Xmx100g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench \
  > /tmp/bench_newops2_100x.stdout 2> /tmp/bench_newops2_100x.stderr
echo "SF10 EXIT $?" >> /tmp/newops2_r17.status

SPARK_GRAFT_CLUSTER_QUERIES=$OPS SPARK_GRAFT_BENCH_REPS=2 \
  java $AO -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.tools.ClusterCheck bench /root/testdata/sf0.1 \
  /tmp/bench_newops2_cluster.json \
  > /tmp/cluster_newops2.stdout 2> /tmp/cluster_newops2.stderr
echo "CLUSTER EXIT $?" >> /tmp/newops2_r17.status
echo "ALLDONE" >> /tmp/newops2_r17.status

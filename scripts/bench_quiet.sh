#!/bin/bash
# probe: 8s idle/steal sample; require >31 cores idle and ~zero steal
read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
sleep 8
read -r _ u2 n2 s2 i2 w2 irq2 sirq2 st2 _ < /proc/stat
idle=$(( (i2 - i1) / 8 ))   # jiffies/s; 100/core → 3200 = fully idle
steal=$(( st2 - st1 ))
echo "probe idle=$idle steal=$steal"
if [ "$idle" -lt 3050 ] || [ "$steal" -gt "${GRAFT_MAX_STEAL:-120}" ]; then
  echo "NOT QUIET - skipping run"; exit 2
fi
cd /root/repo
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"
# Mirror build.sbt's forked-run JVM exactly: -Xmx8g keeps
# CompressedOops ON (a 100g heap turned the JSON-parse ingest leg
# into a 10x crawl: 8-byte oops + lazy GC), and the -D flags are
# part of the bench contract (UTC session tz, no UI).
exec java -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp "$CP" graft.Bench
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
#        SPARK_GRAFT_ROUND=NN scripts/bench_quiet.sh
# Probe-gated bench: samples /proc/stat for 8 s and only launches the
# bench when >95% of the 32 cores are idle AND hypervisor steal is ~0 —
# the steal counter is the sensitive signal for the ambient-contention
# pattern that taints most runs on this host (rounds 16-18: totals
# inflate uniformly 25-60% while in-VM load reads idle). Runs graft.Bench
# straight from compiled classes (sbt adds ~20 s spin-up and a project
# lock). Exit 2 = not quiet, nothing ran.

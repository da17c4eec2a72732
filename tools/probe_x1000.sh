#!/bin/bash
# x1000-rung single-query probe with a disk watchdog: runs ONE board query
# via graft.Verify against a GenScaled dir, sampling root-fs usage every 5s;
# kills the JVM if available disk drops under the floor (default 8 GiB)
# rather than wedging the box. Prints the peak usage delta at the end.
#   usage: probe_x1000.sh <sfDir> <outDir> <query> [xmx] [cpus] [floorGiB]
set -u
SF=$1; OUT=$2; Q=$3; XMX=${4:-80g}; CPUS=${5:-24}; FLOOR_GB=${6:-8}
BASE_AVAIL=$(df --output=avail -B1G / | tail -1 | tr -d ' ')
SPARK_GRAFT_CPUS=$CPUS java -Xmx$XMX \
  -cp target/scala-2.13/classes:'/opt/spark/jars/*' \
  graft.Verify "$SF" "$OUT" "$Q" > /tmp/probe_${Q}.log 2>&1 &
PID=$!
PEAK_USED=0
while kill -0 $PID 2>/dev/null; do
  AVAIL=$(df --output=avail -B1G / | tail -1 | tr -d ' ')
  USED=$((BASE_AVAIL - AVAIL))
  [ "$USED" -gt "$PEAK_USED" ] && PEAK_USED=$USED
  if [ "$AVAIL" -lt "$FLOOR_GB" ]; then
    echo "[watchdog] avail ${AVAIL}G < floor ${FLOOR_GB}G - killing $Q"
    kill -9 $PID
    wait $PID 2>/dev/null
    echo "RESULT $Q KILLED peak_extra_used=${PEAK_USED}G"
    exit 2
  fi
  sleep 5
done
wait $PID; RC=$?
echo "RESULT $Q rc=$RC peak_extra_used=${PEAK_USED}G"
exit $RC

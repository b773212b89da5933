#!/usr/bin/env bash
# Scaling-efficiency evidence under spark-submit with REAL multi-JVM
# executors: Spark's local-cluster[N, coresPerExec, memMB] master spawns N
# CoarseGrainedExecutorBackend JVMs (own heap, own GC, own allocator) on
# this box — the closest sandbox analogue of "N vs 4N executors on a
# cluster" the north rule asks for (one memory bus is still shared; see
# BASELINE.md for the bandwidth-ceiling analysis).
#
# Usage: tools/scaling_cluster.sh [N] [MULT] [MEM_MB]
#   N executors vs 4N executors, 1 core each; identical input.
# Requires: sbt package has produced target/scala-2.13/rabidaspark_*.jar
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:-1}"
MULT="${2:-64}"
MEM="${3:-12288}"
SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
JAR=$(ls target/scala-2.13/rabidaspark_*.jar | head -1)

run_one() { # $1 = executor count
  local execs="$1"
  local cores=$((execs))  # 1 core per executor
  /opt/spark/bin/spark-submit \
    --master "local-cluster[${execs},1,${MEM}]" \
    --conf spark.executor.memory=$((MEM - 1024))m \
    --conf spark.driver.memory=8g \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    --conf "spark.executor.extraJavaOptions=-XX:+UseParallelGC -XX:ParallelGCThreads=2 -XX:CICompilerCount=2" \
    --class graft.ScalingWorker \
    "$JAR" "$cores" "$SF_DIR" "$MULT" 2>/dev/null \
    | grep SCALING_RESULT
}

echo "== local-cluster scaling: ${N} vs $((4 * N)) executors, 1 core each, mult=${MULT} =="
A=$(SPARK_GRAFT_FAMILY=list run_one "$N")
B=$(SPARK_GRAFT_FAMILY=list run_one "$((4 * N))")
echo "N : $A"
echo "4N: $B"
python3 - "$A" "$B" "$N" <<'EOF'
import json, re, sys
a = json.loads(re.sub(r'^SCALING_RESULT ', '', sys.argv[1]))
b = json.loads(re.sub(r'^SCALING_RESULT ', '', sys.argv[2]))
n = int(sys.argv[3])
eff = (a["sec"] / b["sec"]) / 4.0
print(json.dumps({
    "mode": "spark-submit local-cluster (multi-JVM executors)",
    "pages": a["pages"],
    "n_execs": n, "t_n_sec": a["sec"], "thr_n": round(a["pages"]/a["sec"], 1),
    "n4_execs": 4 * n, "t_4n_sec": b["sec"], "thr_4n": round(b["pages"]/b["sec"], 1),
    "scaling_efficiency": round(eff, 3)}))
EOF

#!/usr/bin/env bash
# Scaling-efficiency evidence under spark-submit with REAL multi-JVM
# executors: Spark's local-cluster[N, coresPerExec, memMB] master spawns N
# CoarseGrainedExecutorBackend JVMs (own heap, own GC, own allocator) on
# this box — the closest sandbox analogue of "N vs 4N executors on a
# cluster" the north rule asks for (one memory bus is still shared; see
# BASELINE.md for the bandwidth-ceiling analysis).
#
# Executor JVM flags (round-4 revision): just ParallelGC, with default
# GC/JIT thread counts. The round-2 pinning (-XX:ParallelGCThreads=2
# -XX:CICompilerCount=2, meant to emulate a 1-core node's thread budget)
# is a measured poison on this workload: with 2 compiler threads the C2
# queue backs up and extraction runs interpreted (~100× slower) for
# minutes, the interpreted path's allocation rate then drowns 2 GC
# threads (12.7 s young GCs observed), and the controlled flag matrix
# (BASELINE.md round 4) showed 10.7 s → 32.3 s from CICompilerCount=2
# alone and → 119.6 s with both pins at 4 executors / 60k pages. A real
# cluster node JVM sizes these pools from the node's cores; pinning them
# under a 32-core-visible JVM models nothing real.
#
# PREFLIGHT: multi-JVM runs on this sandbox are only meaningful when the
# box's first-touch page-fault path is healthy. Round 4 caught the VM in
# a state where CONCURRENT first-touch faults across several JVMs cost
# ~1 ms each (~100× normal; executor /proc stime 4-100× utime, every jar
# equally affected, single-JVM local[4] unaffected) — any local-cluster
# number taken in that state is an artifact of the sandbox's memory
# backend, not of the code. The preflight measures fault throughput with
# 4 concurrent 1 GiB touchers and refuses to certify when it is degraded.
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

echo "== preflight: concurrent first-touch page-fault throughput =="
python3 - <<'EOF'
import multiprocessing as mp, time, sys
def touch(_):
    n = 1 << 30
    t0 = time.time()
    b = bytearray(n)          # zero-fill touches every page
    return n / 1048576 / (time.time() - t0)
with mp.Pool(4) as p:
    rates = p.map(touch, range(4))
per = sum(rates) / len(rates)
print(f"   4x concurrent 1GiB first-touch: {per:.0f} MB/s per process")
if per < 300:
    print("   PREFLIGHT FAIL: fault path degraded (>~3us/page under "
          "concurrency); multi-JVM numbers would measure the sandbox's "
          "memory backend, not the engine. Use graft.ScalingBenchForked "
          "(single-JVM two-parallelism protocol) instead.", file=sys.stderr)
    sys.exit(3)
EOF

# Stage 2 (round-5 addition): the round-4 18:38 coda proved a passing
# 4x1GiB probe does NOT protect a 4x19GB JVM fleet — the collapse is
# TRIGGERED by fleet-sized concurrent heap faulting (~20 GC threads per
# JVM pre-touching fresh heap). So probe with the real thing: 4
# concurrent full-heap AlwaysPreTouch JVMs, each pre-touching the same
# heap the executors below will use. Healthy DRAM pretouches >1 GB/s per
# JVM; the degraded path measured 14 MB/s.
echo "== preflight 2: fleet-sized fault storm (4x ${MEM}MB AlwaysPreTouch JVMs) =="
STORM_T0=$(date +%s.%N)
STORM_PIDS=()
for i in 1 2 3 4; do
  java -Xms"${MEM}"m -Xmx"${MEM}"m -XX:+AlwaysPreTouch -XX:+UseParallelGC -version >/dev/null 2>&1 &
  STORM_PIDS+=($!)
done
# a probe JVM that cannot even start (overcommit refusal, cgroup limit,
# OOM-kill) exits in milliseconds — a bare `wait` would discard the error
# and the tiny elapsed time would compute as a huge MB/s, false-PASSING
# on exactly the memory-constrained box this stage exists to reject
STORM_FAILED=0
for pid in "${STORM_PIDS[@]}"; do
  wait "$pid" || STORM_FAILED=1
done
if [ "$STORM_FAILED" -ne 0 ]; then
  echo "   PREFLIGHT FAIL (fleet-sized): a ${MEM}MB AlwaysPreTouch probe JVM" >&2
  echo "   exited nonzero — the box cannot back 4x full executor heaps at all." >&2
  exit 3
fi
STORM_T1=$(date +%s.%N)
python3 - "$STORM_T0" "$STORM_T1" "$MEM" <<'EOF'
import sys
t = float(sys.argv[2]) - float(sys.argv[1])
mem_mb = int(sys.argv[3])
per = mem_mb / t  # MB/s per JVM (all 4 pretouch concurrently)
print(f"   4x concurrent {mem_mb}MB JVM pretouch in {t:.1f}s: {per:.0f} MB/s per JVM")
if per < 300:
    print("   PREFLIGHT FAIL (fleet-sized): full-heap concurrent faulting is "
          "degraded even though the small probe passed — exactly the round-4 "
          "18:38 failure mode. Multi-JVM numbers on this box would measure "
          "the sandbox's memory backend, not the engine.", file=sys.stderr)
    sys.exit(3)
EOF

run_one() { # $1 = executor count
  local execs="$1"
  local cores=$((execs))  # 1 core per executor
  /opt/spark/bin/spark-submit \
    --master "local-cluster[${execs},1,${MEM}]" \
    --conf spark.executor.memory=$((MEM - 1024))m \
    --conf spark.driver.memory=8g \
    --conf spark.ui.enabled=false \
    --conf spark.sql.session.timeZone=UTC \
    --conf "spark.executor.extraJavaOptions=-XX:+UseParallelGC" \
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

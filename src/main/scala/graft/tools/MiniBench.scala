package graft.tools

/** Throwaway focused re-runner (guide §1): N reps of a subset of bench
  * queries with per-rep wall + GC, for A/B-ing one variable (e.g. the
  * corpus cache mode) without paying the full suite per data point.
  * Usage: MiniBench <reps> <query> [query...]
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 4
    val queries = if (args.length > 1) args.drop(1).toSeq
      else Seq("crawl_list", "pagerank_hosts")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    graft.corpus.Fixtures.corpus(spark, sfDir)
    def gc(): Long = {
      val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
      var t = 0L
      while (it.hasNext) { val x = it.next().getCollectionTime; if (x > 0) t += x }
      t
    }
    for (q <- queries; r <- 1 to reps) {
      val g0 = gc()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"MINIBENCH $q%-24s rep$r wall=${(System.nanoTime() - t0) / 1e9}%6.2f s gc=${gc() - g0}%5d ms rows=$n")
    }
    spark.stop()
  }
}

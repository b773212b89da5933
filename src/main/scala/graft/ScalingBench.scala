package graft

/** Scaling-efficiency evidence for the north rule: run the identical crawl
  * job at two parallelism levels (local[N] vs local[4N]) on the same input
  * and report throughput at both plus efficiency = (T_N / T_4N) / 4.
  *
  * (The sandbox has no multi-node cluster — BASELINE.md documents this
  * stand-in; on a real cluster the same job runs under spark-submit with
  * N vs 4N executors.)
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "8").toInt
    // corpus multiplier: replicate the document set with remapped ids so
    // the parallel work (fetch-join + parse + extract per page) dominates
    // the fixed per-round driver costs — the regime a 10^10-URL frontier
    // is always in
    val mult = sys.env.getOrElse("SPARK_GRAFT_MULT", "16").toInt

    def measure(cpus: Int): (Long, Double) = {
      val spark = Bench.mkSession(cpus.toString)
      import spark.implicits._
      spark.sparkContext.setLogLevel("WARN")
      val baseDocs = spark.read.parquet(s"$sfDir/documents.parquet")
        .selectExpr("doc_id", "text", "lang").as[graft.corpus.Fixtures.Doc].collect()
      val docs = (0 until mult).flatMap(m =>
        baseDocs.map(d => d.copy(doc_id = d.doc_id + m * 1000000L)))
      val corpus = spark.createDataset(docs).repartition(cpus * 2)
        .flatMap(graft.corpus.Fixtures.pagesForDoc _).toDF()
      corpus.cache(); corpus.count() // materialize outside the timed window
      val seeds = docs.map(d => (s"d${d.doc_id}", s"${graft.corpus.Fixtures.base(d.doc_id)}/list/p1.html"))
      val crawler = new graft.engine.Crawler(spark, corpus)
      // warmup (JIT + codegen) on a small slice
      crawler.crawl(CrawlQueries.listJob, seeds.take(50)).count()
      // two timed repetitions, best-of (JIT/GC noise suppression)
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = crawler.crawl(CrawlQueries.listJob, seeds)
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        (rows, sec)
      }
      val rows = runs.head._1
      val sec = runs.map(_._2).min
      val pages = rows / 4 // 4 items per list page, by construction
      spark.stop()
      (pages, sec)
    }

    // interleave configs across separate SparkSessions and take the best
    // time per config: successive sessions in one JVM inherit GC/code-cache
    // state, so a single A-then-B pass is biased either way
    val schedule = Seq(n, 4 * n, n, 4 * n)
    val results = schedule.map(c => c -> measure(c))
    val (pagesN, secN) = (results.filter(_._1 == n).map(_._2._1).head,
      results.filter(_._1 == n).map(_._2._2).min)
    val (pages4N, sec4N) = (results.filter(_._1 == 4 * n).map(_._2._1).head,
      results.filter(_._1 == 4 * n).map(_._2._2).min)
    require(pagesN == pages4N, "same input must yield same page count")
    val thrN = pagesN / secN
    val thr4N = pages4N / sec4N
    val eff = (secN / sec4N) / 4.0
    println(f"""{"sf":"$sfDir%s","pages":$pagesN%d,"n_cores":$n%d,"t_n_sec":$secN%.2f,"thr_n_pages_per_sec":$thrN%.1f,"n4_cores":${4 * n}%d,"t_4n_sec":$sec4N%.2f,"thr_4n_pages_per_sec":$thr4N%.1f,"scaling_efficiency":$eff%.3f}""")
  }
}

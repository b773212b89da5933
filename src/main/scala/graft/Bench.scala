package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: headline crawl throughput (pages/sec
  * fetch+extract — the BASELINE.json metric) plus per-query seconds for
  * the other operator families. One JSON line on stdout.
  *
  * Politeness delay is 0 here: the metric is engine throughput, not sleep
  * budget (the pacing contract is verified separately by the
  * `politeness_schedule` oracle query). AQE on; frontier broadcast on.
  */
object Bench {

  def mkSession(cpus: String): SparkSession = {
    val builder = SparkSession.builder()
    // under spark-submit the master (e.g. local-cluster[4,1,8192] — real
    // multi-JVM executors, the closest one-box analogue of N executors)
    // comes from the command line; default to local[cpus] only when none
    // was given
    if (!sys.props.contains("spark.master")) builder.master(s"local[$cpus]")
    builder
    .appName("graft-bench")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  }

  def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** (name, pages crawled, rows out, seconds). */
  def runCrawls(spark: SparkSession, sfDir: String): Seq[(String, Long, Long, Double)] = {
    def one(name: String, df: => org.apache.spark.sql.DataFrame): (String, Long, Long, Double) = {
      val (out, sec) = time {
        val d = df
        val rows = d.count()
        val pages = d.select("doc_id", "page_no").distinct().count()
        (pages, rows)
      }
      (name, out._1, out._2, sec)
    }
    Seq(
      one("crawl_list", CrawlQueries.crawlList(spark, sfDir)),
      one("crawl_xpath", CrawlQueries.crawlXpath(spark, sfDir)),
      one("crawl_scroll", CrawlQueries.crawlScroll(spark, sfDir))
    )
  }

  def runPipeline(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    def one(name: String, df: => org.apache.spark.sql.DataFrame): (String, Double) = {
      val (_, sec) = time(df.count())
      (name, sec)
    }
    Seq(
      one("dedup_exact", PipelineQueries.dedupExact(spark, sfDir)),
      one("dedup_minhash_lsh", PipelineQueries.dedupMinhashLsh(spark, sfDir)),
      one("ann_topk", PipelineQueries.annTopK(spark, sfDir)),
      one("emb_near_dup", PipelineQueries.embNearDup(spark, sfDir)),
      one("lang_id", PipelineQueries.langId(spark, sfDir)),
      one("token_count", PipelineQueries.tokenCount(spark, sfDir)),
      one("q1_agg", PipelineQueries.q1Agg(spark, sfDir)),
      one("q_events_window", PipelineQueries.qEventsWindow(spark, sfDir))
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // corpus generation (cached) happens once, outside the timed crawls
    graft.corpus.Fixtures.corpus(spark, sfDir)

    val crawls = runCrawls(spark, sfDir)
    val pipeline = runPipeline(spark, sfDir)

    val totalPages = crawls.map(_._2).sum
    val crawlSec = crawls.map(_._4).sum
    val pagesPerSec = if (crawlSec > 0) totalPages / crawlSec else 0.0

    val queries =
      (crawls.map { case (n, _, _, s) => n -> s } ++ pipeline)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val total = crawlSec + pipeline.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$queries%s,"sf":"$sfDir%s","pages_per_sec":$pagesPerSec%.1f,"pages":$totalPages%d,"cpus":"$cpus%s"}""")
    spark.stop()
  }
}

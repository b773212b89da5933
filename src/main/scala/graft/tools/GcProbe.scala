package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway measurement probe (guide §1): per-rep GC attribution for the
  * bench suite — young vs FULL collections, heap occupancy after each rep,
  * and the persistent-RDD/broadcast block population — to test the theory
  * that the 1–5 s "PS MarkSweep" spikes landing on random reps are the
  * suite's accumulated cache/broadcast blocks being collected. Runs the
  * SAME queries with the SAME actions as graft.Bench (reps configurable);
  * NOT part of the bench contract. Launch directly with the bench child's
  * JVM flags (-Xmx24g -XX:+UseParallelGC) to reproduce its GC regime.
  */
object GcProbe {
  private def gcBean(name: String) = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .find(_.getName == name)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = graft.Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    graft.corpus.Fixtures.corpus(spark, sfDir)

    val young = gcBean("PS Scavenge").orElse(gcBean("G1 Young Generation"))
    val full = gcBean("PS MarkSweep").orElse(gcBean("G1 Old Generation"))
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean

    def snap(): (Long, Long, Long, Long) = (
      young.map(_.getCollectionCount).getOrElse(0L), young.map(_.getCollectionTime).getOrElse(0L),
      full.map(_.getCollectionCount).getOrElse(0L), full.map(_.getCollectionTime).getOrElse(0L))

    def storage(): String = {
      val infos = sc.getRDDStorageInfo
      val memB = infos.map(_.memSize).sum
      val diskB = infos.map(_.diskSize).sum
      f"rdds=${infos.length}%3d cachedMB=${memB / 1024 / 1024}%5d diskMB=${diskB / 1024 / 1024}%4d"
    }

    // whole-JVM allocation delta via TLAB-accurate per-thread counters
    // (com.sun.management): counts every thread alive at both snapshots;
    // short-lived task threads may escape, so this is a LOWER bound.
    val tmx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    def allocated(): Long =
      tmx.getThreadAllocatedBytes(tmx.getAllThreadIds).filter(_ > 0).sum

    def run(name: String, act: => Long): Unit = {
      (1 to reps).foreach { rep =>
        val (yc0, yt0, fc0, ft0) = snap()
        val a0 = allocated()
        val t0 = System.nanoTime()
        val n = act
        val wall = (System.nanoTime() - t0) / 1e9
        val a1 = allocated()
        val (yc1, yt1, fc1, ft1) = snap()
        val used = mem.getHeapMemoryUsage.getUsed / 1024 / 1024
        println(f"GCPROBE $name%-24s rep$rep wall=$wall%6.2f s  young=${yc1 - yc0}%2d/${yt1 - yt0}%5d ms  FULL=${fc1 - fc0}%d/${ft1 - ft0}%5d ms  heapUsed=${used}%5d MB  allocMB=${(a1 - a0) / 1024 / 1024}%6d  ${storage()}  rows=$n")
      }
    }

    import org.apache.spark.sql.functions._
    def crawlAct(df: => org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)).as("rows"),
        count_distinct(struct(col("doc_id"), col("page_no"))).as("pages")).head().getLong(0)

    run("crawl_list", crawlAct(graft.CrawlQueries.crawlList(spark, sfDir)))
    run("crawl_xpath", crawlAct(graft.CrawlQueries.crawlXpath(spark, sfDir)))
    run("crawl_scroll", crawlAct(graft.CrawlQueries.crawlScroll(spark, sfDir)))
    run("dedup_exact", graft.PipelineQueries.dedupExact(spark, sfDir).count())
    run("dedup_minhash_lsh", graft.PipelineQueries.dedupMinhashLsh(spark, sfDir).count())
    run("ann_topk", graft.PipelineQueries.annTopK(spark, sfDir).count())
    run("emb_near_dup", graft.PipelineQueries.embNearDup(spark, sfDir).count())
    run("lang_id", graft.PipelineQueries.langId(spark, sfDir).count())
    run("token_count", graft.PipelineQueries.tokenCount(spark, sfDir).count())
    run("q1_agg", graft.PipelineQueries.q1Agg(spark, sfDir).count())
    run("q_events_window", graft.PipelineQueries.qEventsWindow(spark, sfDir).count())
    run("repetition_stats", graft.PipelineQueries.repetitionStats(spark, sfDir).count())
    run("pagerank_hosts", graft.CrawlQueries.pagerankHosts(spark, sfDir).count())
    run("crawl_rank_prioritized", graft.CrawlQueries.crawlRankPrioritized(spark, sfDir).count())
    run("recrawl_due", graft.CrawlQueries.recrawlDue(spark, sfDir).count())

    println(s"GCPROBE end ${storage()}")
    spark.stop()
  }
}

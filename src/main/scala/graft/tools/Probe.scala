package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Throwaway measurement probe (guide §1): stage-level wall/task times for
  * the heavy crawl queries, plus partitioning facts the plan hides.
  * NOT part of the bench contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val m = si.taskMetrics
        val site = si.details.linesIterator.filter(l => l.contains("graft") || l.contains("Probe"))
          .take(2).mkString(" <- ")
        stages.put(si.stageId, f"wall=${wall}%6d ms tasks=${si.numTasks}%4d " +
          f"taskTime=${m.executorRunTime}%6d gc=${m.jvmGCTime}%5d " +
          f"deser=${m.executorDeserializeTime}%5d " +
          f"in=${m.inputMetrics.bytesRead / 1024}%7d KB sr=${m.shuffleReadMetrics.totalBytesRead / 1024}%6d KB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1024}%6d KB | ${si.name.split(" ").head}%s | $site%s")
      }
    })

    val corpus = graft.corpus.Fixtures.corpus(spark, sfDir)
    println(s"PROBE corpus partitions = ${corpus.rdd.getNumPartitions}, rows = ${corpus.count()}")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"PROBE documents partitions = ${docs.rdd.getNumPartitions}")

    def run(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      stages.clear()
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val df = f
      import org.apache.spark.sql.functions._
      val r = df.agg(count(lit(1)), count_distinct(struct(col("doc_id"), col("page_no")))).head()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%s total $sec%.3f s rows=${r.getLong(0)}")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, line) =>
        println(f"PROBE   stage $id%4d $line%s")
      }
    }

    def gcMs(): Long = {
      val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
      var t = 0L
      while (it.hasNext) { val c = it.next().getCollectionTime; if (c > 0) t += c }
      t
    }
    def runCount(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      stages.clear()
      spark.sparkContext.setJobDescription(name)
      val g0 = gcMs(); val t0 = System.nanoTime()
      val df = f
      val n = df.count()
      println(f"PROBE $name%s total ${(System.nanoTime() - t0) / 1e9}%.3f s gc=${gcMs() - g0} rows=$n")
      import scala.jdk.CollectionConverters._
      stages.asScala.toSeq.sortBy(_._1).foreach { case (id, line) =>
        println(f"PROBE   stage $id%4d $line%s")
      }
    }
    // warm-up rep then measured rep, mirroring the bench shape
    run("crawl_list warm", graft.CrawlQueries.crawlList(spark, sfDir))
    run("crawl_scroll warm", graft.CrawlQueries.crawlScroll(spark, sfDir))
    run("crawl_scroll", graft.CrawlQueries.crawlScroll(spark, sfDir))
    runCount("crawl_rank_prioritized warm", graft.CrawlQueries.crawlRankPrioritized(spark, sfDir))
    runCount("crawl_rank_prioritized", graft.CrawlQueries.crawlRankPrioritized(spark, sfDir))
    spark.stop()
  }
}

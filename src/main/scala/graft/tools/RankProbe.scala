package graft.tools

import org.apache.spark.scheduler._

/** Throwaway measurement probe (guide §1): why is crawl_rank_prioritized's
  * SECOND rep reproducibly ~2-3x slower than reps 1 and 3 (non-GC wall)?
  * Runs the query 3 times with a stage listener and prints, per rep, every
  * stage over a wall threshold plus the gaps BETWEEN jobs (driver-side
  * time: planning, codegen, broadcast builds). NOT part of the bench.
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    case class Ev(kind: String, id: Int, t0: Long, t1: Long, tasks: Int, name: String)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[Ev]()
    spark.sparkContext.addSparkListener(new SparkListener {
      private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit = jobStart.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        events.add(Ev("job", j.jobId, jobStart.getOrDefault(j.jobId, j.time), j.time, 0, ""))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val site = si.details.linesIterator
          .filter(l => l.contains("graft") && !l.contains("RankProbe"))
          .take(2).mkString(" <- ")
        events.add(Ev("stage", si.stageId, si.submissionTime.getOrElse(0L),
          si.completionTime.getOrElse(0L), si.numTasks,
          si.name.split(" ").head + " | " + site))
      }
    })

    graft.corpus.Fixtures.corpus(spark, sfDir)
    // warm the whole path once like the suite does (pagerank_hosts runs first in the bench)
    graft.CrawlQueries.pagerankHosts(spark, sfDir).count()

    (1 to 3).foreach { rep =>
      events.clear()
      val t0 = System.nanoTime()
      val n = graft.CrawlQueries.crawlRankPrioritized(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val evs = events.asScala.toVector.sortBy(_.t0)
      val jobs = evs.filter(_.kind == "job")
      // serial accounting: walk jobs in start order; time covered by SOME
      // job vs gaps where NO job ran (driver-side planning/codegen)
      var covered = 0L; var gaps = 0L; var cursor = 0L
      jobs.foreach { j =>
        if (cursor == 0L) cursor = j.t0
        if (j.t0 > cursor) { gaps += j.t0 - cursor; cursor = j.t0 }
        if (j.t1 > cursor) { covered += j.t1 - cursor; cursor = j.t1 }
      }
      println(f"RANKPROBE rep$rep wall=$wall%6.2f s rows=$n jobs=${jobs.size} jobTime=${covered}%d ms gapTime=${gaps}%d ms")
      jobs.foreach { j =>
        println(f"RANKPROBE   job ${j.id}%3d wall=${j.t1 - j.t0}%6d ms start=${j.t0}%d")
      }
      evs.filter(e => e.kind == "stage" && (e.t1 - e.t0) > 250).foreach { s =>
        println(f"RANKPROBE   stage ${s.id}%4d wall=${s.t1 - s.t0}%6d ms tasks=${s.tasks}%3d ${s.name}")
      }
    }
    spark.stop()
  }
}

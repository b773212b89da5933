package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, count_distinct, lit, struct}

/** Driver-run benchmark: headline crawl throughput (pages/sec
  * fetch+extract — the BASELINE.json metric) plus per-query seconds for
  * the other operator families. One JSON line on stdout.
  *
  * Measurement protocol (round-4 hardening — BENCH_r02/r03 proved the
  * naive single-shot numbers irreproducible: r03 was recorded on a box
  * still loaded from the correctness gate and overstated the suite 2×,
  * r02 caught an unusually idle box and understated it):
  *
  *  1. FORKED, PINNED JVM. The suite runs in a child java process with
  *     ParallelGC (BASELINE.md: 2–5× over G1 on this allocation-heavy
  *     workload) and a fixed heap, independent of however sbt/spark-submit
  *     launched the parent; the JVM config is recorded in the artifact.
  *     Falls back to in-process (flagged `"forked":false`) if the fork
  *     cannot start.
  *  2. QUIESCE GATE. Before timing, waits (bounded) for the box's 1-min
  *     load average to drop below a threshold and records the load at
  *     start — a reader can see whether the numbers are trustworthy.
  *  3. MEDIAN OF 3. Each query runs `reps` times; the artifact reports the
  *     per-query median (first rep absorbs JIT/codegen warmup; median
  *     rejects a one-off GC pause or noisy neighbor).
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

  /** Cumulative GC time of this JVM (all collectors), for per-rep GC
    * attribution: local-mode executors share the bench JVM, so the delta
    * across a rep is the rep's own GC bill.
    */
  private def gcMillis(): Long = {
    val it = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.iterator()
    var total = 0L
    while (it.hasNext) { val t = it.next().getCollectionTime; if (t > 0) total += t }
    total
  }

  /** (result, wall seconds, GC millis) for one rep — `gc_ms` rides in the
    * artifact next to `reps_sec` so a reader can attribute rep spread to
    * collection pauses without rerunning.
    */
  def timeGc[A](f: => A): (A, Double, Long) = {
    val g0 = gcMillis()
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9, gcMillis() - g0)
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** (name, pages crawled, rows out, per-rep seconds). ONE action per rep:
    * rows and distinct pages come from a single agg, so the crawl's
    * post-checkpoint flatten/orderBy executes once per measurement (the
    * r03 verdict flagged the old count-then-distinct double execution).
    */
  def runCrawls(spark: SparkSession, sfDir: String, reps: Int): Seq[(String, Long, Long, Seq[(Double, Long)])] = {
    def one(name: String, df: => org.apache.spark.sql.DataFrame): (String, Long, Long, Seq[(Double, Long)]) = {
      val runs = (1 to reps).map { _ =>
        timeGc {
          // struct() preserves distinct-row semantics under NULLs —
          // count_distinct(a, b) would silently skip rows where either
          // column is null, understating the pages_per_sec denominator
          val r = df.agg(count(lit(1)).as("rows"),
            count_distinct(struct(col("doc_id"), col("page_no"))).as("pages")).head()
          (r.getLong(1), r.getLong(0))
        }
      }
      val (pages, rows) = runs.head._1
      (name, pages, rows, runs.map(r => (r._2, r._3)))
    }
    Seq(
      one("crawl_list", CrawlQueries.crawlList(spark, sfDir)),
      one("crawl_xpath", CrawlQueries.crawlXpath(spark, sfDir)),
      one("crawl_scroll", CrawlQueries.crawlScroll(spark, sfDir))
    )
  }

  def runPipeline(spark: SparkSession, sfDir: String, reps: Int): Seq[(String, Seq[(Double, Long)])] = {
    def one(name: String, df: => org.apache.spark.sql.DataFrame): (String, Seq[(Double, Long)]) =
      (name, (1 to reps).map { _ => val r = timeGc(df.count()); (r._2, r._3) })
    Seq(
      one("dedup_exact", PipelineQueries.dedupExact(spark, sfDir)),
      one("dedup_minhash_lsh", PipelineQueries.dedupMinhashLsh(spark, sfDir)),
      one("ann_topk", PipelineQueries.annTopK(spark, sfDir)),
      one("emb_near_dup", PipelineQueries.embNearDup(spark, sfDir)),
      one("lang_id", PipelineQueries.langId(spark, sfDir)),
      one("token_count", PipelineQueries.tokenCount(spark, sfDir)),
      one("q1_agg", PipelineQueries.q1Agg(spark, sfDir)),
      one("q_events_window", PipelineQueries.qEventsWindow(spark, sfDir)),
      // round 5: Gopher repetition pass (map-only UDF) and the host-graph
      // PageRank (5 iterations of shuffle-by-dst over extracted edges)
      one("repetition_stats", PipelineQueries.repetitionStats(spark, sfDir)),
      one("pagerank_hosts", CrawlQueries.pagerankHosts(spark, sfDir)),
      // round-5 close: the composed rank-guided crawl (hub crawl + rank +
      // top-K budget + frontier slice) and the map-only recrawl due-set
      one("crawl_rank_prioritized", CrawlQueries.crawlRankPrioritized(spark, sfDir)),
      one("recrawl_due", CrawlQueries.recrawlDue(spark, sfDir))
    )
  }

  private def loadAvg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split("\\s+")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** Bounded quiesce gate: wait for 1-min load < threshold (the bench
    * itself is about to create load; this only defends against a PRIOR
    * job still draining, the BENCH_r03 failure mode). Returns
    * (load at entry, load when timing starts, seconds waited).
    */
  private def quiesce(maxLoad: Double, maxWaitSec: Int): (Double, Double, Double) = {
    val entry = loadAvg1m()
    var now = entry
    var waited = 0.0
    while (now > maxLoad && waited < maxWaitSec) {
      Thread.sleep(5000)
      waited += 5
      now = loadAvg1m()
    }
    (entry, now, waited)
  }

  /** The measured suite, printed as the one JSON artifact line. */
  def runSuite(forked: Boolean): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val (loadEntry, loadStart, waitedSec) = quiesce(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "4.0").toDouble,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXWAIT", "180").toInt)

    val spark = mkSession(cpus)
    spark.sparkContext.setLogLevel("WARN")

    // corpus generation (cached) happens once, outside the timed window
    graft.corpus.Fixtures.corpus(spark, sfDir)

    val crawls = runCrawls(spark, sfDir, reps)
    val pipeline = runPipeline(spark, sfDir, reps)

    val totalPages = crawls.map(_._2).sum
    val crawlSec = crawls.map(c => median(c._4.map(_._1))).sum
    val pagesPerSec = if (crawlSec > 0) totalPages / crawlSec else 0.0

    val perQuery =
      crawls.map { case (n, _, _, ts) => n -> ts } ++ pipeline
    val queries = perQuery
      .map { case (k, ts) => "\"" + k + "\":" + f"${median(ts.map(_._1))}%.3f" }
      .mkString("{", ",", "}")
    val repsJson = perQuery
      .map { case (k, ts) => "\"" + k + "\":[" + ts.map(t => f"${t._1}%.3f").mkString(",") + "]" }
      .mkString("{", ",", "}")
    val gcJson = perQuery
      .map { case (k, ts) => "\"" + k + "\":[" + ts.map(_._2.toString).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val total = crawlSec + pipeline.map(p => median(p._2.map(_._1))).sum
    val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
    val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    val gcName = gc.get(0).getName.replaceAll("[^A-Za-z0-9 ]", "")
    val xmxMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val artifact =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$queries%s,"sf":"$sfDir%s","pages_per_sec":$pagesPerSec%.1f,"pages":$totalPages%d,"cpus":"$cpus%s","reps":$reps%d,"stat":"median","reps_sec":$repsJson%s,"gc_ms":$gcJson%s,"load_1m_entry":$loadEntry%.2f,"load_1m_start":$loadStart%.2f,"quiesce_wait_sec":$waitedSec%.0f,"jvm":{"forked":$forked%b,"gc":"$gcName%s","max_heap_mb":$xmxMb%d,"version":"${System.getProperty("java.version")}%s"}}"""
    println(artifact)
    // the same line lands on disk so repo prose can quote the exact
    // shipped run instead of whichever terminal scrollback survived
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench-latest.json"))
      if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out, (artifact + "\n").getBytes("UTF-8"))
    } catch { case _: Exception => () } // stdout line is the contract; the file is best-effort
    spark.stop()
  }

  /** Effective classpath of THIS process: under `sbt runMain` the real
    * classpath lives in the application classloader's URLs, not
    * java.class.path (which is just sbt-launch.jar); under spark-submit /
    * plain java both agree. Union of the two, so the child JVM resolves
    * graft + spark either way.
    */
  private def effectiveClasspath(): String = {
    def urls(cl: ClassLoader): Seq[java.net.URL] = cl match {
      case null => Nil
      case u: java.net.URLClassLoader => u.getURLs.toSeq ++ urls(u.getParent)
      case other => urls(other.getParent)
    }
    val fromLoader = urls(getClass.getClassLoader).flatMap { u =>
      try Some(java.nio.file.Paths.get(u.toURI).toString)
      catch { case _: Exception => None }
    }
    (fromLoader ++ sys.props("java.class.path").split(java.io.File.pathSeparator))
      .distinct.mkString(java.io.File.pathSeparator)
  }

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
    "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Fork the suite into a pinned child JVM and relay its artifact line.
    * Child stdout other than the artifact goes to stderr (visible, never
    * corrupts the one-JSON-line contract).
    */
  private def forkAndRelay(): Boolean = {
    val xmx = sys.env.getOrElse("SPARK_GRAFT_BENCH_XMX", "24g")
    val gcFlag = sys.env.getOrElse("SPARK_GRAFT_BENCH_GC", "UseParallelGC")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd = Seq(javaBin, s"-Xmx$xmx", s"-XX:+$gcFlag",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC") ++
      addOpens ++ Seq("-cp", effectiveClasspath(), "graft.Bench")
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_INPROC", "1")
      pb.redirectErrorStream(false)
      val proc = pb.start()
      // drain stderr concurrently so the child never blocks on a full pipe
      val errPump = new Thread(() =>
        scala.io.Source.fromInputStream(proc.getErrorStream).getLines()
          .foreach(System.err.println), "bench-child-stderr")
      errPump.setDaemon(true); errPump.start()
      var artifact: Option[String] = None
      scala.io.Source.fromInputStream(proc.getInputStream).getLines().foreach { l =>
        if (l.startsWith("""{"metric":""")) artifact = Some(l)
        else System.err.println(l)
      }
      proc.waitFor()
      artifact match {
        case Some(line) if proc.exitValue() == 0 => println(line); true
        case _ => false
      }
    } catch { case _: Exception => false }
  }

  def main(args: Array[String]): Unit = {
    if (sys.env.contains("SPARK_GRAFT_BENCH_INPROC")) runSuite(forked = true)
    else if (!forkAndRelay()) {
      System.err.println("bench: fork failed, falling back to in-process (unpinned JVM)")
      runSuite(forked = false)
    }
  }
}

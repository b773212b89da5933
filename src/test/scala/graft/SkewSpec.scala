package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Fixtures
import graft.engine.{Crawler, Politeness}

/** Host-skew behavior (SURVEY.md §7 hard part 5, FIXTURES.md Zipf note):
  * one hot host must not serialize a round's parse work, and the politeness
  * schedule must still be exactly per-host.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("skew-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Zipf-ish: host h0 owns ~half the docs, tail spread over 19 hosts.
  // Fixtures.host uses doc_id % 50, so choose doc ids whose residues
  // collide on 0 for the hot host.
  val hotDocs: Seq[Long] = (0 until 40).map(i => i * 50L)       // all on h0.test
  val tailDocs: Seq[Long] = (1 to 40).map(_.toLong)             // h1..h40
  lazy val docs = (hotDocs ++ tailDocs).map(d =>
    Fixtures.Doc(d, s"alpha beta gamma delta epsilon zeta eta theta iota d$d", "en"))

  lazy val corpus = {
    val s = spark
    import s.implicits._
    docs.flatMap(Fixtures.pagesForDoc).toDF()
  }

  def seeds: Seq[(String, String)] =
    docs.map(d => (s"d${d.doc_id}", s"${Fixtures.base(d.doc_id)}/list/p1.html"))

  test("politeness-on crawl over a Zipf host distribution is correct") {
    val c = new Crawler(spark, corpus,
      Crawler.Config(politeness = Politeness.Config(delayMinMs = 50, delayMaxMs = 50)))
    val out = c.crawl(CrawlQueries.listJob, seeds).filter(col("item").isNotNull)
    assert(out.count() == docs.size * 3 * 4)
    // per-host schedule: the hot host's round-1 fetches are serialized
    // 50ms apart; hottest scheduled_ms = (n_hot-1)*50 within the round
    val hot = out.filter(col("url").contains("h0.test") && col("page_no") === 1)
      .select("scheduled_ms").distinct().collect().map(_.getLong(0)).sorted
    assert(hot.length == hotDocs.size)
    assert(hot.last == (hotDocs.size - 1) * 50L)
    // tail hosts all start at 0 in parallel
    val tail = out.filter(col("url").contains("h7.test") && col("page_no") === 1)
      .select("scheduled_ms").distinct().collect().map(_.getLong(0))
    assert(tail.forall(_ == 0L))
  }

  test("realPace: wall-clock emission honors the per-host schedule") {
    // 3 docs on one host, fixed 120ms delay, 1 page each → emissions at
    // ~0/120/240ms of the round; wall time of round 1 ≥ 240ms
    // d0, d100 → h0.test (doc_id % 50 == 0); d7 → h7.test
    val three = Seq(docs.head, docs.find(_.doc_id == 7L).get,
      Fixtures.Doc(100L, "x y z w v u t s r q p", "en"))
    val s = spark
    import s.implicits._
    val c2 = three.flatMap(Fixtures.pagesForDoc).toDF()
    val cr = new Crawler(spark, c2, Crawler.Config(
      politeness = Politeness.Config(delayMinMs = 120, delayMaxMs = 120),
      realPace = true, maxRounds = 1))
    val sds = three.map(d => (s"d${d.doc_id}", s"${Fixtures.base(d.doc_id)}/list/p1.html"))
    val t0 = System.currentTimeMillis()
    val out = cr.crawl(CrawlQueries.listJob, sds)
      .select("url", "host", "scheduled_ms", "emitted_ms").distinct().collect()
    val wall = System.currentTimeMillis() - t0
    // hosts here: d0,d100 → h0.test (2 fetches, gap 120ms); d7 → h7.test
    val h0 = out.filter(_.getString(1) == "h0.test").sortBy(_.getLong(2))
    assert(h0.map(_.getLong(2)).toSeq == Seq(0L, 120L))
    assert(h0.forall(r => r.getLong(3) >= r.getLong(2))) // emitted at/after schedule
    assert(wall >= 120, s"round must take at least the max per-host schedule (took ${wall}ms)")
  }

  test("extraction work rebalances off the host partitioning") {
    import graft.urls.Urls
    val s = spark
    import s.implicits._
    val rows = docs.map(d => (s"${Fixtures.base(d.doc_id)}/list/p1.html",
      Fixtures.host(d.doc_id), Urls.urlHash(s"${Fixtures.base(d.doc_id)}/list/p1.html")))
    val df = rows.toDF("url", "host", "url_hash")
    val paced = Politeness.schedule(df, Politeness.Config(delayMinMs = 50, delayMaxMs = 50))
    // without rebalance: hot host h0 concentrates 50% of rows in one partition
    val skewed = paced.groupBy(spark_partition_id().as("p")).count()
      .agg(max("count")).head.getLong(0)
    // explicit partition count: AQE would otherwise coalesce this tiny
    // frame to one partition (at scale it right-sizes instead)
    val balanced = paced.repartition(8, col("url_hash"))
      .groupBy(spark_partition_id().as("p")).count()
      .agg(max("count")).head.getLong(0)
    assert(skewed >= hotDocs.size, s"window partitioning concentrates the hot host (max=$skewed)")
    assert(balanced < hotDocs.size / 2,
      s"url_hash repartition must spread the hot host (max=$balanced)")
  }

  test("realPace bin-packing: one hot host, slot utilization >= 80%") {
    // SURVEY.md §7 hard part 6: under wall-clock pacing, hosts are packed
    // into bins by delay budget and each bin runs its schedule in
    // scheduled_ms order, so the hot host's mandated waits are filled with
    // tail-host work instead of idling every slot.
    //   hot host: 25 fetches 60ms apart → 1.44s span (the delay budget)
    //   tail: 96 hosts × 8 rows, no delay — pure work
    //   per-row simulated fetch/parse work: 8ms spin
    // ideal makespan ≈ max(hot span, total work / bins); the old url-hash
    // layout would put late hot targets in every partition (each task
    // sleeps ~the whole span BEFORE its work → utilization ~50%).
    val s = spark
    import s.implicits._
    val bins = 4
    val workMsPerRow = 8L
    val hot = (0 until 25).map(i => (s"http://hot.test/p$i.html", "hot.test", i * 60L))
    val tail = for (h <- 0 until 96; i <- 0 until 8)
      yield (s"http://t$h.test/p$i.html", s"t$h.test", 0L)
    val df = (hot ++ tail).toDF("url", "host", "scheduled_ms")
    val packed = Politeness.packForPace(df, bins)
    assert(packed.rdd.getNumPartitions == bins)
    val t0 = System.currentTimeMillis()
    val paced = Politeness.pace(packed, t0)
    val stats = paced.select("host", "scheduled_ms", "emitted_ms").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val start = System.currentTimeMillis()
        var busy = 0L
        var rows = 0L
        var lateHot = 0L
        it.foreach { r =>
          val w0 = System.nanoTime()
          while (System.nanoTime() - w0 < workMsPerRow * 1000000L) {} // simulated fetch/parse
          busy += (System.nanoTime() - w0) / 1000000L
          rows += 1
          if (r.getString(0) == "hot.test" && r.getLong(2) < r.getLong(1)) lateHot += 1
        }
        Iterator((pid, System.currentTimeMillis() - start, busy, rows, lateHot))
      }.collect()
    val makespanMs = System.currentTimeMillis() - t0
    val totalBusy = stats.map(_._3).sum.toDouble
    val totalWall = stats.map(_._2).sum.toDouble
    // slot utilization over the tasks' own walls — the overlap property
    // itself, independent of session-startup/scheduling noise. The url-hash
    // layout lands ~0.5 here (every task sleeps the span BEFORE its work);
    // packing + scheduled-order keeps threads busy through the waits.
    val utilization = totalBusy / totalWall
    assert(stats.map(_._4).sum == hot.size + tail.size)
    assert(stats.map(_._5).sum == 0L, "hot host must never emit before its schedule")
    // hot span 1440ms; work 793*8 = 6.3s over 4 bins → ideal ~1.7s + startup
    assert(makespanMs <= 4000,
      s"packed makespan must stay near max(span, work/bins) (took ${makespanMs}ms)")
    assert(utilization >= 0.8,
      f"waits must overlap tail work: utilization=$utilization%.2f makespan=${makespanMs}ms " +
        stats.sortBy(_._1).map(t => s"p${t._1}:wall=${t._2}ms,busy=${t._3}ms").mkString(" "))
  }
}

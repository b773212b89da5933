package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.corpus.Fixtures
import graft.engine.{Crawler, Politeness}

class CrawlerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("crawler-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docs = Seq(
    Fixtures.Doc(0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"),
    Fixtures.Doc(7L, "one two three four five six seven eight nine ten eleven", "en"),
    Fixtures.Doc(50L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed", "zh")
  )

  lazy val corpus = {
    val s = spark
    import s.implicits._
    docs.flatMap(Fixtures.pagesForDoc).toDF()
  }

  def crawler(politeness: Politeness.Config = Politeness.Config(), robots: Boolean = false) =
    new Crawler(spark, corpus, Crawler.Config(politeness = politeness, respectRobots = robots))

  def seeds(path: Long => String): Seq[(String, String)] =
    docs.map(d => (s"d${d.doc_id}", path(d.doc_id)))

  test("list crawl: 3 pages x 4 items per seed, golden values, ordering") {
    val out = crawler().crawl(CrawlQueries.listJob, seeds(d => s"${Fixtures.base(d)}/list/p1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "pos", "item.title", "item.link", "item.date_s", "item.snip")
      .collect()
    assert(out.length == 3 * 3 * 4)
    val r = out.filter(x => x.getString(0) == "d7" && x.getInt(1) == 2 && x.getInt(2) == 1).head
    assert(r.getString(3) == "Doc 7 item 2-2")
    assert(r.getString(4) == "http://h7.test/d7/list/art_7_2_2.html")
    assert(r.getString(5) == "2024-02-02")
    assert(r.getString(6) == "one two three four five six seven eight ")
  }

  test("xpath crawl: commentList extraction + aria-disabled stop at page 3") {
    val out = crawler().crawl(CrawlQueries.cmtJob, seeds(d => s"${Fixtures.base(d)}/cmt/p1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "pos", "item.content", "item.ctime")
      .collect()
    assert(out.length == 3 * 3 * 3)
    val r = out.filter(x => x.getString(0) == "d0" && x.getInt(1) == 3 && x.getInt(2) == 0).head
    assert(r.getString(3) == "cmt 0 3-1 alpha beta gamma delta epsilon zeta eta ")
    assert(r.getString(4) == "2024-03-11")
    // per-item relative `//` — item 3 must carry ITS content, not item 1's
    val r3 = out.filter(x => x.getString(0) == "d0" && x.getInt(1) == 2 && x.getInt(2) == 2).head
    assert(r3.getString(3) == "cmt 0 2-3 alpha beta gamma delta epsilon zeta eta ")
    assert(r3.getString(4) == "2024-02-13")
  }

  test("paginate condition stops after aria-disabled page 5") {
    val out = crawler().crawl(CrawlQueries.condJob, seeds(d => s"${Fixtures.base(d)}/cond/p1.html"))
      .filter(col("item").isNotNull)
    assert(out.count() == 3 * 5 * 2) // pages 1..5, never 6
    assert(out.agg(max("page_no")).head.getInt(0) == 5)
  }

  test("iframe father scoping + document-wide paginator") {
    val out = crawler().crawl(CrawlQueries.ifrJob, seeds(d => s"${Fixtures.base(d)}/ifr/p1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "item.title", "item.link")
      .collect()
    assert(out.length == 3 * 3 * 3)
    assert(out.exists(r => r.getString(2) == "IT 50 2-3" && r.getString(3) == "http://h0.test/d50/ifr/arti_50_2_3.html"))
  }

  test("scroll crawl: cursor dedup — only new items each round, global pos") {
    val out = crawler().crawlScroll(CrawlQueries.moreJob, seeds(d => s"${Fixtures.base(d)}/more/s1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "pos", "item.title")
      .collect()
    assert(out.length == 3 * 12) // 4 + 4 + 4 new items per seed
    // page 2 must yield exactly items 5..8 at pos 4..7
    val p2 = out.filter(r => r.getString(0) == "d0" && r.getInt(1) == 2).sortBy(_.getInt(2))
    assert(p2.map(_.getInt(2)).toSeq == Seq(4, 5, 6, 7))
    assert(p2.head.getString(3) == "More 0 item 5")
  }

  test("smooth scroll: full re-extract, raw DOM attrs (no absolutization)") {
    val out = crawler().crawlScrollSmooth(CrawlQueries.feedJob, seeds(d => s"${Fixtures.base(d)}/feed/s1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "pos", "item.txt", "item.link", "item.dt", "item.labels")
      .collect()
    assert(out.length == 3 * (3 + 4 + 5))
    val r = out.filter(x => x.getString(0) == "d7" && x.getInt(1) == 2 && x.getInt(2) == 3).head
    assert(r.getString(3) == "Tweet 7 no 4")
    assert(r.getString(4) == "/u/status/7004") // raw, not absolutized (C3)
    assert(r.getString(5) == "2024-03-04T00:00:00Z")
    assert(r.getString(6) == "12 replies, 20 likes")
  }

  test("dynamic paginator function selects per-page templated selector") {
    val out = crawler().crawl(CrawlQueries.dynJob, seeds(d => s"${Fixtures.base(d)}/dyn/p1.html"))
      .filter(col("item").isNotNull)
    assert(out.count() == 3 * 3 * 2)
  }

  test("robots gating drops disallowed seeds") {
    val s = seeds(d => if (d % 5 == 0) s"http://${Fixtures.host(d)}/blocked/d$d.html"
      else s"http://${Fixtures.host(d)}/ok/d$d.html")
    val out = crawler(robots = true).crawl(CrawlQueries.robotsJob, s)
      .filter(col("item").isNotNull)
      .select("seed_id").collect().map(_.getString(0)).toSet
    assert(out == Set("d7")) // d0, d50 divisible by 5 → blocked
  }

  test("edge semantics: concat-all, zero-drop, empty-record drop") {
    val out = crawler().crawl(CrawlQueries.edgeJob, seeds(d => s"${Fixtures.base(d)}/edge/e1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "pos", "item.ab", "item.date_s", "item.noval")
      .collect()
    assert(out.length == 3 * 2) // third li dropped (empty record)
    val li1 = out.filter(r => r.getString(0) == "d0" && r.getInt(1) == 0).head
    assert(li1.getString(2) == "A0B0")
    assert(li1.isNullAt(3) && li1.isNullAt(4))
    val li2 = out.filter(r => r.getString(0) == "d0" && r.getInt(1) == 1).head
    assert(li2.isNullAt(2) && li2.getString(3) == "2024-01-01")
  }

  test("entities decoded in innerText") {
    val out = crawler().crawl(CrawlQueries.entitiesJob, seeds(d => s"${Fixtures.base(d)}/edge/e1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "item.val").collect()
    assert(out.exists(r => r.getString(0) == "d0" && r.getString(1) == "<x> & \"q\" ©0"))
  }

  test("politeness: fixed 100ms delay serializes hosts, scheduled_ms = seq*100") {
    val out = crawler(politeness = Politeness.Config(delayMinMs = 100, delayMaxMs = 100))
      .crawl(CrawlQueries.listJob, seeds(d => s"${Fixtures.base(d)}/list/p1.html"))
      .select("seed_id", "page_no", "url", "scheduled_ms", "fetch_seq").distinct()
      .collect()
    // d0 and d50 share host h0 — within each round their two fetches are
    // 100ms apart; d7 is alone on h7 at 0ms
    val h0r1 = out.filter(r => r.getInt(1) == 1 && Set("d0", "d50").contains(r.getString(0)))
      .sortBy(_.getString(2))
    assert(h0r1.map(_.getLong(3)).toSeq == Seq(0L, 100L))
    val d7 = out.filter(r => r.getString(0) == "d7").map(_.getLong(3)).toSeq
    assert(d7.forall(_ == 0L))
  }

  test("checkpoint/resume: killing after round 1 resumes to identical result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val full = crawler().crawl(CrawlQueries.listJob, seeds(d => s"${Fixtures.base(d)}/list/p1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "pos", "item.title").collect().map(_.toString).sorted

    // run only 1 round, committing snapshots
    val c1 = new Crawler(spark, corpus, Crawler.Config(maxRounds = 1, checkpointDir = Some(tmp)))
    val partial = c1.crawl(CrawlQueries.listJob, seeds(d => s"${Fixtures.base(d)}/list/p1.html"))
      .filter(col("item").isNotNull)
    assert(partial.agg(max("page_no")).head.getInt(0) == 1)

    // resume from snapshot: rounds 2..3
    val c2 = new Crawler(spark, corpus, Crawler.Config(checkpointDir = Some(tmp)))
    val resumed = c2.crawl(CrawlQueries.listJob, seeds(d => s"${Fixtures.base(d)}/list/p1.html"))
      .filter(col("item").isNotNull)
      .select("seed_id", "page_no", "pos", "item.title").collect()
    // resumed run covers pages 2..3; union with round-1 partial == full
    val combined = (partial.select("seed_id", "page_no", "pos", "item.title").collect() ++ resumed)
      .map(_.toString).sorted
    assert(combined.toSeq == full.toSeq)
  }

  test("url-seen set prevents refetch and terminates self-loops") {
    val out = crawler().crawl(CrawlQueries.listJob, seeds(d => s"${Fixtures.base(d)}/list/p1.html"))
    val urls = out.select("url").distinct().count()
    assert(urls == 3 * 3) // 3 seeds x 3 pages, each exactly once
  }
}

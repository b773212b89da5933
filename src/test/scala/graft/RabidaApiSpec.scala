package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.api.{Rabida, RabiConfig}
import graft.corpus.Fixtures

/** The reference-user migration surface: same Job shape, same callback
  * cadence (per page for single-seed jobs), same abort semantics.
  */
class RabidaApiSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("rabida-api-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val corpus = {
    val s = spark
    import s.implicits._
    Seq(Fixtures.Doc(0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en"))
      .flatMap(Fixtures.pagesForDoc).toDF()
  }

  test("Crawl: hello_world shape — callback per page, Limit abort") {
    val rabida = new Rabida(spark, corpus, RabiConfig(delay = (0, 0)))
    val job = CrawlQueries.listJob.copy(link = s"${Fixtures.base(0)}/list/p1.html")
    var pagesSeen = Vector.empty[(Int, Int, String)]
    rabida.crawl(job) { (ret, nextPageUrl, pageNo) =>
      pagesSeen :+= ((pageNo, ret.size, nextPageUrl))
      pageNo >= job.limit // the reference tests' canonical abort line
    }
    assert(pagesSeen.map(_._1) == Vector(1, 2, 3))
    assert(pagesSeen.forall(_._2 == 4))
    assert(pagesSeen(0)._3.endsWith("/list/p2.html"))
    assert(pagesSeen(2)._3 == "")
    val firstTitle = Vector("Doc 0 item 1-1")
    val _ = firstTitle
  }

  test("Crawl: early abort stops pagination") {
    val rabida = new Rabida(spark, corpus, RabiConfig(delay = (0, 0)))
    val job = CrawlQueries.listJob.copy(link = s"${Fixtures.base(0)}/list/p1.html", limit = 0)
    var n = 0
    rabida.crawl(job) { (_, _, _) => n += 1; n >= 2 }
    assert(n == 2)
  }

  test("CrawlScroll: cursor advances by new items per round") {
    val rabida = new Rabida(spark, corpus, RabiConfig(delay = (0, 0)))
    val job = CrawlQueries.moreJob.copy(link = s"${Fixtures.base(0)}/more/s1.html")
    var rounds = Vector.empty[(Int, Int, Int)]
    rabida.crawlScroll(job) { (ret, cursor, pageNo) =>
      rounds :+= ((pageNo, ret.size, cursor))
      false
    }
    assert(rounds == Vector((1, 4, 4), (2, 4, 8), (3, 4, 12)))
  }

  test("CrawlScrollSmooth: full re-extract each round") {
    val rabida = new Rabida(spark, corpus, RabiConfig(delay = (0, 0)))
    val job = CrawlQueries.feedJob.copy(link = s"${Fixtures.base(0)}/feed/s1.html")
    var sizes = Vector.empty[Int]
    rabida.crawlScrollSmooth(job) { (ret, _) => sizes :+= ret.size; false }
    assert(sizes == Vector(3, 4, 5))
  }

  test("DownloadFile: payload lands as a file, callback gets the path") {
    val out = java.nio.file.Files.createTempDirectory("rabida-dl").toString
    val rabida = new Rabida(spark, corpus, RabiConfig(delay = (0, 0), out = out))
    val job = CrawlQueries.listJob.copy(link = s"${Fixtures.base(0)}/list/p1.html")
    var path = ""
    rabida.downloadFile(job)(p => path = p)
    assert(path.nonEmpty && new java.io.File(path).length() > 0)
  }

  test("RabiConfig env parity: RABI_ prefixed knobs, duration parsing") {
    val c = RabiConfig.loadFromEnv(Map(
      "RABI_DELAY" -> "1s,2s", "RABI_CONCURRENCY" -> "1",
      "RABI_THROTTLE_NUM" -> "2", "RABI_THROTTLE_DURATION" -> "1s",
      "RABI_TIMEOUT" -> "3s", "RABI_MODE" -> "headless",
      "RABI_SCROLL_TYPE" -> "scrollTo"))
    assert(c.delay == (1000L, 2000L))
    assert(c.throttleNum == 2 && c.throttleDurationMs == 1000L)
    assert(c.timeoutMs == 3000L)
    assert(c.scrollType == "scrollTo")
    // defaults parity with config.go
    val d = RabiConfig.loadFromEnv(Map.empty)
    assert(d.delay == (2000L, 3000L) && d.timeoutMs == 10000L && d.mode == "headless")
  }
}

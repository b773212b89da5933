package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.api.{Rabida, RabiConfig}
import graft.extract._

/** Reference-test parity: the EXACT Job definitions from the reference's
  * own test files (same selector strings verbatim), run hermetically
  * against synthetic DOMs shaped like the live sites those tests hit
  * (BASELINE.json: "matching rabida's own example-site tests ... identical
  * crawl ordering and final URL-seen set").
  */
class ReferenceParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("reference-parity")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def corpusOf(pages: (String, String)*) = {
    val s = spark
    import s.implicits._
    pages.toSeq.map { case (url, html) =>
      (url, new java.sql.Timestamp(0L), html.getBytes("UTF-8"), "", "zh-CN")
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  // ---- hello_world_test.go:24-41 (tieba.baidu.com) — selectors verbatim

  test("hello_world job: tieba list shape, 3 pages, Limit abort, ordering") {
    def page(no: Int, hasNext: Boolean): String = {
      val items = (1 to 3).map { i =>
        s"""<li class="j_thread_list"><div class="threadlist_title"><a href="/p/$no$i">NBA thread $no-$i</a></div><span class="threadlist_reply_date">202$no-$i</span></li>"""
      }.mkString
      val pager =
        if (hasNext) s"""<div id="frs_list_pager"><a class="next pagination-item" href="f?kw=nba&pn=${no * 50}">下一页&gt;</a></div>"""
        else ""
      s"""<html><body><ul id="thread_list">$items</ul>$pager</body></html>"""
    }
    val corpus = corpusOf(
      "https://tieba.baidu.com/f?kw=nba" -> page(1, hasNext = true),
      "https://tieba.baidu.com/f?kw=nba&pn=50" -> page(2, hasNext = true),
      "https://tieba.baidu.com/f?kw=nba&pn=100" -> page(3, hasNext = true),
      "https://tieba.baidu.com/f?kw=nba&pn=150" -> page(4, hasNext = false))

    val job = Job(
      link = "https://tieba.baidu.com/f?kw=nba",
      cssSelector = Selector(
        scope = "#thread_list > li.j_thread_list",
        attrs = Some(Map(
          "title" -> Selector(css = "div.threadlist_title > a"),
          "date" -> Selector(css = "span.threadlist_reply_date")))),
      paginator = Selector(css = "#frs_list_pager > a.next.pagination-item"),
      limit = 3)

    var order = Vector.empty[(Int, Vector[(String, String)])]
    new Rabida(spark, corpus, RabiConfig(delay = (0, 0))).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => (r.getString(r.fieldIndex("title")), r.getString(r.fieldIndex("date")))).toVector))
      pageNo >= job.limit // the reference callback verbatim
    }
    // identical crawl ordering: pages 1,2,3 (Limit aborts before 4)
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(0)._2 == Vector(("NBA thread 1-1", "2021-1"), ("NBA thread 1-2", "2021-2"), ("NBA thread 1-3", "2021-3")))
    assert(order(2)._2.head._1 == "NBA thread 3-1")
  }

  // ---- xpath_test.go:18-35 (ctrip comments) — xpaths verbatim

  test("xpath job: ctrip comment shape, xpath paginator guard") {
    def page(no: Int, last: Boolean): String = {
      val items = (1 to 2).map { i =>
        s"""<div><div class="commentDetail">comment $no-$i text</div><div class="commentTime">2024-0$no-0$i</div></div>"""
      }.mkString
      val dis = if (last) "true" else "false"
      s"""<html><body><div id="commentModule"><div class="commentList">$items</div><ul><li class=" ant-pagination-next" aria-disabled="$dis"><a href="p${no + 1}.html">next</a></li></ul></div></body></html>"""
    }
    val base = "https://you.ctrip.com/sight/shenzhen26"
    val corpus = corpusOf(
      s"$base/2778.html" -> page(1, last = false),
      s"$base/p2.html" -> page(2, last = false),
      s"$base/p3.html" -> page(3, last = true),
      s"$base/p4.html" -> page(4, last = true))

    val job = Job(
      link = s"$base/2778.html",
      cssSelector = Selector(
        xpathScope = """//*[@id="commentModule"]/div[@class='commentList']/div""",
        attrs = Some(Map(
          "content" -> Selector(xpath = "//div[@class='commentDetail']"),
          "date" -> Selector(xpath = "//div[@class='commentTime']")))),
      paginator = Selector(
        xpath = "//*[@id='commentModule']//li[@class=' ant-pagination-next' and not(@aria-disabled='true')]"),
      limit = 3)

    var order = Vector.empty[(Int, Seq[String])]
    new Rabida(spark, corpus, RabiConfig(delay = (0, 0))).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(_.getString(0)).toSeq)) // content field
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    // rawText parity: htmlquery.InnerText = verbatim text
    assert(order(1)._2.contains("comment 2-1 text"))
  }

  // ---- ctrip_test.go:94-151 — GetAttributeValueEvent + CheckFunc verbatim

  test("paginate-condition job: aria-disabled CheckFunc stops the crawl") {
    def page(no: Int, disabled: Boolean): String = {
      s"""<html><body><div id="sightcommentbox"><div class="comment_single"><span>c$no</span></div></div><a class="nextpage${if (disabled) " disabled" else ""}" aria-disabled="$disabled" href="pp${no + 1}.html">next</a></body></html>"""
    }
    val corpus = corpusOf(
      "https://x.test/c1.html" -> page(1, disabled = false),
      "https://x.test/pp2.html" -> page(2, disabled = false),
      "https://x.test/pp3.html" -> page(3, disabled = true),
      "https://x.test/pp4.html" -> page(4, disabled = true))

    val job = Job(
      link = "https://x.test/c1.html",
      cssSelector = Selector(
        scope = "#sightcommentbox > div.comment_single",
        attrs = Some(Map("c" -> Selector(css = "span")))),
      paginator = Selector(css = "a.nextpage:not(.disabled)", attr = "href"),
      paginatorCondition = Some(Condition(
        value = "false",
        checkFunc = (text, value) => text == value, // reference CheckFunc shape
        execType = GetAttributeValueEvent,
        execSelector = Selector(css = "a.nextpage", attr = "aria-disabled"))),
      limit = 0)

    var pages = Vector.empty[Int]
    new Rabida(spark, corpus, RabiConfig(delay = (0, 0))).crawl(job) { (_, _, pageNo) =>
      pages :+= pageNo; false
    }
    assert(pages == Vector(1, 2, 3)) // page 3 extracted, then condition stops
  }
}

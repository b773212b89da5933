package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.api.{Rabida, RabiConfig}
import graft.extract._

/** Verbatim twins of the remaining reference test files (VERDICT r1 item 5):
  * each test carries the EXACT Job definition (selector strings verbatim)
  * from the named `*_test.go`, run hermetically against a synthetic corpus
  * shaped like the live site that test hits. Together with
  * ReferenceParitySpec, every reference test file now has a named twin.
  */
class ReferenceParityMoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("reference-parity-more")
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

  private def rabida(corpus: org.apache.spark.sql.DataFrame) =
    new Rabida(spark, corpus, RabiConfig(delay = (0, 0)))

  // ---- nextpage_test.go:17-39 (js.wuxi.gov.cn) — selectors verbatim

  test("nextpage job: wuxi doclist, .next paginator click, Limit 3") {
    val base = "http://js.wuxi.gov.cn/zfxxgk/xxgkml/fgwjjjd/bmwj"
    def page(no: Int): String = {
      val items = (1 to 2).map { i =>
        s"""<li><a title="doc $no-$i" href="/doc/$no$i.shtml">doc $no-$i short</a><span>2024-0$no-0$i</span></li>"""
      }.mkString
      s"""<html><body><ul id="doclist">$items</ul><a class="next" href="index_$no.shtml">下一页</a></body></html>"""
    }
    val corpus = corpusOf(
      s"$base/index.shtml" -> page(1),
      s"$base/index_1.shtml" -> page(2),
      s"$base/index_2.shtml" -> page(3),
      s"$base/index_3.shtml" -> page(4))

    val job = Job(
      link = s"$base/index.shtml",
      cssSelector = Selector(
        scope = "#doclist>li",
        attrs = Some(Map(
          "title" -> Selector(css = "a", attr = "title"),
          "link" -> Selector(css = "a", attr = "href"),
          "date" -> Selector(css = "span")))),
      paginator = Selector(css = ".next"),
      limit = 3)

    var order = Vector.empty[(Int, Vector[(String, String, String)])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => (
        r.getString(r.fieldIndex("title")),
        r.getString(r.fieldIndex("link")),
        r.getString(r.fieldIndex("date")))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(0)._2.head == (("doc 1-1", "http://js.wuxi.gov.cn/doc/11.shtml", "2024-01-01")))
    assert(order(2)._2.map(_._1) == Vector("doc 3-1", "doc 3-2"))
  }

  // ---- iframe_test.go:15-57 TestRabidaCrawlIframe (jinan) — verbatim

  test("iframe job (jinan): inlined #zpinfo003 iframe scoping + pgBtn paginator") {
    val base = "http://www.jinan.gov.cn/col/col27544"
    def page(no: Int, last: Boolean): String = {
      val rows = (1 to 2).map { i =>
        s"""<tr><td><a title="job $no-$i" href="/art/$no$i.html">job $no-$i</a></td><td><span>2024-$no-$i</span></td></tr>"""
      }.mkString
      val next =
        if (last) """<a class="pgBtn disabledTd">&gt;</a>"""
        else s"""<a class="pgBtn" href="index_${no + 1}.html">&gt;</a>"""
      s"""<html><body>
         |<iframe id="zpinfo003"><form id="searchform"></form><table>$rows</table></iframe>
         |<div class="pg"><a class="pgBtn">&lt;&lt;</a><a class="pgBtn">&lt;</a>$next</div>
         |</body></html>""".stripMargin
    }
    val corpus = corpusOf(
      s"$base/index.html" -> page(1, last = false),
      s"$base/index_2.html" -> page(2, last = false),
      s"$base/index_3.html" -> page(3, last = false),
      s"$base/index_4.html" -> page(4, last = true))

    val job = Job(
      link = s"$base/index.html",
      cssSelector = Selector(
        scope = "#searchform+table tr",
        iframe = true,
        iframeSelector = Some(Selector(css = "#zpinfo003")),
        attrs = Some(Map(
          "title" -> Selector(css = "a", attr = "title"),
          "date" -> Selector(css = "td:last-child>span"),
          "link" -> Selector(css = "a", attr = "href")))),
      paginator = Selector(css = "a.pgBtn:nth-child(3):not(.disabledTd)"),
      limit = 3)

    var order = Vector.empty[(Int, Vector[String])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => r.getString(r.fieldIndex("title"))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(0)._2 == Vector("job 1-1", "job 1-2"))
    assert(order(2)._2 == Vector("job 3-1", "job 3-2"))
  }

  // ---- iframe_test.go:59-105 TestRabidaCrawlIframe1 (suzhou) — verbatim,
  //      CROSS-DOCUMENT iframe (src points at another corpus url) + an
  //      XPATH in the Paginator.Css field (chromedp.BySearch tolerance)

  test("iframe job (suzhou): cross-document iframe via src join, xpath-in-css paginator") {
    val base = "http://www.suzhou.gov.cn/szsrmzf/zfxxgkzl"
    def framePage(no: Int): String = {
      val rows = (1 to 2).map { i =>
        s"""<tr><td><a title="policy $no-$i" href="http://www.suzhou.gov.cn/art/$no$i.html">policy $no-$i</a></td><td>2024-0$no-0$i</td></tr>"""
      }.mkString
      s"""<form><table><tbody>$rows</tbody></table></form>"""
    }
    def page(no: Int, last: Boolean): String = {
      val pager =
        if (last) """<span class="upordown"><a>下一页</a></span>"""
        else s"""<span class="upordown"><a href="xxgkml_${no + 1}.shtml">下一页</a></span>"""
      s"""<html><body><iframe id="xxgk_item" src="frame_$no.html"></iframe>$pager</body></html>"""
    }
    val corpus = corpusOf(
      s"$base/xxgkml.shtml" -> page(1, last = false),
      s"$base/frame_1.html" -> framePage(1),
      s"$base/xxgkml_2.shtml" -> page(2, last = false),
      s"$base/frame_2.html" -> framePage(2),
      s"$base/xxgkml_3.shtml" -> page(3, last = true),
      s"$base/frame_3.html" -> framePage(3))

    val job = Job(
      link = s"$base/xxgkml.shtml",
      cssSelector = Selector(
        scope = "body > form > table > tbody > tr",
        iframe = true,
        iframeSelector = Some(Selector(css = "#xxgk_item")),
        attrs = Some(Map(
          "content" -> Selector(css = "a", attr = "title"),
          "date" -> Selector(css = "td:last-child"),
          "link" -> Selector(css = "a", attr = "href")))),
      paginator = Selector(css = "//span[@class='upordown']/a[text()='下一页']"),
      limit = 3)

    var order = Vector.empty[(Int, Vector[(String, String)])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => (
        r.getString(r.fieldIndex("content")), r.getString(r.fieldIndex("date")))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(0)._2 == Vector(("policy 1-1", "2024-01-01"), ("policy 1-2", "2024-01-02")))
    assert(order(2)._2.head._1 == "policy 3-1")
  }

  // ---- scroll_test.go:13-50 CrawlScroll (news.cn) — selectors verbatim

  private def newsScrollCorpus: org.apache.spark.sql.DataFrame = {
    val base = "http://www.news.cn/energy"
    def state(k: Int, total: Int, more: Boolean): String = {
      val items = (1 to total).map { i =>
        s"""<div class="item"><div class="tit"><a href="/story$i.html">energy story $i</a></div><div class="time">2024-$i</div></div>"""
      }.mkString
      val btn = if (more) s"""<div class="xpage-more-btn look"><a href="index_${k + 1}.html">加载更多</a></div>""" else ""
      s"""<html><body><div id="content-list">$items</div><div id="list">$btn</div></body></html>"""
    }
    corpusOf(
      s"$base/index.html" -> state(1, 3, more = true),
      s"$base/index_2.html" -> state(2, 6, more = true),
      s"$base/index_3.html" -> state(3, 9, more = false))
  }

  test("scroll job (news.cn css): cursor dedup across load-more states") {
    val job = Job(
      link = "http://www.news.cn/energy/index.html",
      cssSelector = Selector(
        scope = "#content-list > div.item",
        attrs = Some(Map(
          "title" -> Selector(css = ".tit > a"),
          "date" -> Selector(css = ".time")))),
      paginator = Selector(css = "#list > div.xpage-more-btn.look"),
      limit = 10)

    var rounds = Vector.empty[(Int, Int, Vector[String])]
    rabida(newsScrollCorpus).crawlScroll(job) { (ret, cursor, pageNo) =>
      rounds :+= ((pageNo, cursor, ret.map(r => r.getString(r.fieldIndex("title"))).toVector))
      pageNo >= job.limit
    }
    // three states; each round only extracts items past the cursor (C1)
    assert(rounds.map(_._1) == Vector(1, 2, 3))
    assert(rounds.map(_._2) == Vector(3, 6, 9)) // cursor accumulates
    assert(rounds(0)._3 == Vector("energy story 1", "energy story 2", "energy story 3"))
    assert(rounds(1)._3 == Vector("energy story 4", "energy story 5", "energy story 6"))
    assert(rounds(2)._3 == Vector("energy story 7", "energy story 8", "energy story 9"))
  }

  // ---- scroll_test.go:52-92 CrawlScrollXpath — verbatim xpath variant

  test("scroll job (news.cn xpath): xpath scope cursor rewrite") {
    val job = Job(
      link = "http://www.news.cn/energy/index.html",
      cssSelector = Selector(
        xpathScope = """//*[@id="content-list"]/div""",
        attrs = Some(Map(
          "title" -> Selector(xpath = "//div[@class='tit']"),
          "date" -> Selector(xpath = "//div[@class='time']")))),
      paginator = Selector(css = "#list > div.xpage-more-btn.look"),
      limit = 10)

    var rounds = Vector.empty[(Int, Vector[String])]
    rabida(newsScrollCorpus).crawlScroll(job) { (ret, _, pageNo) =>
      rounds :+= ((pageNo, ret.map(r => r.getString(r.fieldIndex("title"))).toVector))
      pageNo >= job.limit
    }
    assert(rounds.map(_._1) == Vector(1, 2, 3))
    assert(rounds(1)._2 == Vector("energy story 4", "energy story 5", "energy story 6"))
  }

  // ---- scroll_smooth_test.go:16-47 (twitter.com/NASA) — selectors verbatim

  test("scroll-smooth job (twitter): DOM-attribute mode keeps raw hrefs") {
    def tweet(i: Int): String =
      s"""<div data-testid="cellInnerDiv"><article data-testid="tweet">
         |<div data-testid="tweetText">launch update $i</div>
         |<a href="/NASA/status/$i"><time datetime="2024-05-0${i}T10:00:00Z">May $i</time></a>
         |<a role="link" href="/NASA/status/$i">permalink</a>
         |<div data-testid="reply" aria-label="$i replies"></div>
         |<div data-testid="retweet" aria-label="$i reposts"></div>
         |<div data-testid="like" aria-label="$i likes"></div>
         |</article></div>""".stripMargin
    val corpus = corpusOf(
      "https://twitter.com/NASA" -> s"<html><body>${(1 to 3).map(tweet).mkString}</body></html>")

    val job = Job(
      link = "https://twitter.com/NASA",
      cssSelector = Selector(
        scope = "div[data-testid='cellInnerDiv'] article[data-testid='tweet']",
        attrs = Some(Map(
          "title" -> Selector(css = """div[data-testid="tweetText"]"""),
          "date" -> Selector(css = "a > time", attr = "datetime"),
          "link" -> Selector(css = """a[role="link"][href*=status]""", attr = "href"),
          "reply" -> Selector(css = """div[data-testid="reply"]""", attr = "aria-label"),
          "retweet" -> Selector(css = """div[data-testid="retweet"]""", attr = "aria-label"),
          "like" -> Selector(css = """div[data-testid="like"]""", attr = "aria-label")))),
      limit = 5)

    var rows = Vector.empty[(String, String, String, String)]
    rabida(corpus).crawlScrollSmooth(job) { (ret, _) =>
      rows = ret.map(r => (
        r.getString(r.fieldIndex("title")),
        r.getString(r.fieldIndex("date")),
        r.getString(r.fieldIndex("link")),
        r.getString(r.fieldIndex("like")))).toVector
      true
    }
    assert(rows.size == 3)
    assert(rows(0)._1 == "launch update 1")
    assert(rows(1)._2 == "2024-05-02T10:00:00Z")
    // C3: DomAttribute mode — href stays RAW (not absolutized)
    assert(rows(2)._3 == "/NASA/status/3")
    assert(rows(0)._4 == "1 likes")
  }

  // ---- dynamic_nextpagebtn_test.go:14-62 (sjz.gov.cn) — PaginatorFunc verbatim

  test("dynamic nextpagebtn job: per-page paginator selector template") {
    val base = "https://www.sjz.gov.cn/col/1596014942837"
    def page(no: Int, last: Boolean): String = {
      val items = (1 to 2).map { i =>
        s"""<li><a title="notice $no-$i" href="/art/$no$i.html">notice $no-$i</a><span class="date">2024-$no-$i</span></li>"""
      }.mkString
      val next = if (last) "" else s"""<a href="index_${no + 1}.html">下一页</a>"""
      s"""<html><body><div class="nr"><ul>$items</ul></div>
         |<div class="center"><div id="MinyooPage"><a title="当前在第${no}页">$no</a>$next</div></div>
         |</body></html>""".stripMargin
    }
    val corpus = corpusOf(
      s"$base/index.html" -> page(1, last = false),
      s"$base/index_2.html" -> page(2, last = false),
      s"$base/index_3.html" -> page(3, last = false),
      s"$base/index_4.html" -> page(4, last = true))

    val job = Job(
      link = s"$base/index.html",
      cssSelector = Selector(
        scope = ".nr ul li",
        attrs = Some(Map(
          "title" -> Selector(css = "a:first-child", attr = "title"),
          "link" -> Selector(css = "a:first-child", attr = "href"),
          "date" -> Selector(css = "span.date")))),
      paginatorFunc = Some(no => Selector(css = s""".center #MinyooPage>a[title="当前在第${no}页"]+a""")),
      limit = 3)

    var order = Vector.empty[(Int, Vector[String])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => r.getString(r.fieldIndex("title"))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(1)._2 == Vector("notice 2-1", "notice 2-2"))
  }

  // ---- pre_paginate_test.go:16-75 (you.ctrip.com food) — events verbatim

  test("pre-paginate job: SetAttributesValue + Click events carried, crawl unaffected") {
    val base = "https://you.ctrip.com/food/27"
    def page(no: Int, last: Boolean): String = {
      val items = (1 to 2).map { i =>
        s"""<div class="comment_single"><ul><li class="from_link"><span class="f_left"><span><em>2024-0$no-0$i</em></span></span></li><li class="main_con"><span>food comment $no-$i</span></li></ul></div>"""
      }.mkString
      val cls = if (last) "nextpage disabled" else "nextpage"
      s"""<html><body><div id="selectSort"><ul style="display: none;"><li></li><li></li><li><a>好评优先</a></li></ul></div>
         |<div id="sightcommentbox">$items<div class="ttd_pager cf"><div><a class="$cls" href="236629_$no.html">下一页</a></div></div></div>
         |</body></html>""".stripMargin
    }
    val corpus = corpusOf(
      s"$base/236629.html" -> page(1, last = false),
      s"$base/236629_1.html" -> page(2, last = false),
      s"$base/236629_2.html" -> page(3, last = false),
      s"$base/236629_3.html" -> page(4, last = true))

    val prePaginators = Seq(
      EventSelector(
        eventType = SetAttributesValueEvent,
        selector = Selector(css = "#selectSort > ul",
          setAttrs = Seq(SetAttribute("style", "display: block;")))),
      EventSelector(
        eventType = ClickEvent,
        selector = Selector(css = "#selectSort > ul > li:nth-child(3) > a")))

    val job = Job(
      link = s"$base/236629.html",
      prePaginate = prePaginators,
      cssSelector = Selector(
        scope = "#sightcommentbox > div.comment_single",
        attrs = Some(Map(
          "date" -> Selector(css = "ul > li.from_link > span.f_left > span > em"),
          "content" -> Selector(css = "ul > li.main_con > span")))),
      paginator = Selector(css = "#sightcommentbox > div.ttd_pager.cf > div > a.nextpage:not(.disabled)"),
      limit = 3)

    assert(job.prePaginate.length == 2) // L8: config carried with the same names
    var order = Vector.empty[(Int, Vector[(String, String)])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => (
        r.getString(r.fieldIndex("content")), r.getString(r.fieldIndex("date")))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(0)._2.head == (("food comment 1-1", "2024-01-01")))
  }

  // ---- do_something_before_test.go:13-69 (meituan) — Before event verbatim

  test("do-something-before job: Before click condition carried, full text extracted") {
    val base = "https://www.meituan.com/zhoubianyou/1161635"
    def page(no: Int, last: Boolean): String = {
      val items = (1 to 2).map { i =>
        s"""<div class="comment-item"><a class="comment-date">2024-0$no-0$i</a><div class="user-comment"><span>great trip $no-$i 阅读全文 full text here</span></div></div>"""
      }.mkString
      val cls = if (last) "pagination-item pagination-item-comment next-btn" else "pagination-item pagination-item-comment next-btn active"
      s"""<html><body><div id="react"><div><div><div class="center-content clearfix"><div class="left-content"><div><div class="comment-box clearfix">
         |<div class="comment-main">$items</div>
         |<nav><ul><li class="$cls"><a href="p${no + 1}.html">下一页</a></li></ul></nav>
         |</div></div></div></div></div></div></body></html>""".stripMargin
    }
    val corpus = corpusOf(
      s"$base/" -> page(1, last = false),
      s"$base/p2.html" -> page(2, last = false),
      s"$base/p3.html" -> page(3, last = false),
      s"$base/p4.html" -> page(4, last = true))

    val job = Job(
      link = s"$base/",
      cssSelector = Selector(
        scope = "div.comment-main > div.comment-item",
        attrs = Some(Map(
          "date" -> Selector(css = "a.comment-date"),
          "content" -> Selector(css = "div.user-comment span",
            before = Seq(EventSelector(
              eventType = ClickEvent,
              condition = Some(Condition(
                value = "阅读全文",
                checkFunc = (text, value) => text.contains(value),
                execType = TextEvent,
                execSelector = Selector(css = "div.user-comment span"))),
              selector = Selector(css = "div.user-comment span"))))))),
      paginator = Selector(css = "#react > div > div > div.center-content.clearfix > div.left-content > div > div.comment-box.clearfix > nav > ul > li.pagination-item.pagination-item-comment.next-btn.active > a"),
      limit = 3)

    var order = Vector.empty[(Int, Vector[String])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => r.getString(r.fieldIndex("content"))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    // static corpus holds the expanded text; the Before click is a DOM
    // mutation no-op (P13) but its config (incl. CheckFunc) rides the Job
    assert(order(0)._2.head.contains("full text here"))
    assert(job.cssSelector.attrs.get("content").before.head.condition.get.checkFunc("abc阅读全文xyz", "阅读全文"))
  }

  // ---- opennewtab_test.go:12-63 (shenyang.gov.cn) — selectors verbatim

  test("open-new-tab job: nth-last-child paginator, new-tab == successor url") {
    val base = "http://www.shenyang.gov.cn/zwgk/zcwj/zfwj"
    def page(no: Int, last: Boolean): String = {
      val items = (1 to 2).map { i =>
        s"""<div class="title_futi_time"><div class="title"><a href="/wj/$no$i.html">doc $no-$i</a></div><div class="time_pub">2024-0$no-0$i</div></div>"""
      }.mkString
      val next = if (last) """<a class="h12">&gt;</a>""" else s"""<a class="h12" href="index_${no + 1}.html">&gt;</a>"""
      // 7 pager anchors; the next-link sits 4th-from-last (.h12:nth-last-child(4))
      s"""<html><body><div class="list-sp">$items</div>
         |<div class="fanye"><a class="h12">1</a><a class="h12">2</a><a class="h12">3</a>$next<a class="h12">x</a><a class="h12">y</a><a class="h12">z</a></div>
         |</body></html>""".stripMargin
    }
    val corpus = corpusOf(
      s"$base/index.html" -> page(1, last = false),
      s"$base/index_2.html" -> page(2, last = false),
      s"$base/index_3.html" -> page(3, last = false),
      s"$base/index_4.html" -> page(4, last = true))

    val job = Job(
      link = s"$base/index.html",
      cssSelector = Selector(
        scope = ".list-sp .title_futi_time",
        attrs = Some(Map(
          "title" -> Selector(css = ".title > a"),
          "link" -> Selector(css = ".title > a", attr = "href"),
          "date" -> Selector(css = ".time_pub")))),
      paginator = Selector(css = ".fanye > a.h12:nth-last-child(4)"),
      limit = 3)

    var order = Vector.empty[(Int, Vector[String])]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      order :+= ((pageNo, ret.map(r => r.getString(r.fieldIndex("title"))).toVector))
      pageNo >= job.limit
    }
    assert(order.map(_._1) == Vector(1, 2, 3))
    assert(order(2)._2 == Vector("doc 3-1", "doc 3-2"))
  }

  // ---- windown_open_listener_test.go:17-76 (mfb.sh.gov.cn) — verbatim:
  //      attr "node" handle + window-open url capture via JS click (S11)

  test("window-open listener job: node handles resolve to window-open urls") {
    val base = "http://mfb.sh.gov.cn/zwgk/jcgk/zcfg/gfxwj"
    def page(no: Int): String = {
      val rows = (1 to 2).map { i =>
        s"""<tr><td><a href="/wj/detail_$no$i.html">regulation $no-$i</a></td><td>2024-0$no-0$i</td></tr>"""
      }.mkString
      s"""<html><body><table id="Datatable-1"><tbody>$rows</tbody></table>
         |<div name="whj_nextPage"><a href="index_${no + 1}.html">下一页</a></div>
         |</body></html>""".stripMargin
    }
    val corpus = corpusOf(s"$base/index.html" -> page(1), s"$base/index_2.html" -> page(2))

    val job = Job(
      link = s"$base/index.html",
      cssSelector = Selector(
        scope = "#Datatable-1>tbody>tr",
        attrs = Some(Map(
          "title" -> Selector(css = "td:first-child"),
          "link" -> Selector(css = "td:first-child", attr = "node"),
          "date" -> Selector(css = "td:last-child")))),
      paginator = Selector(css = "div[name='whj_nextPage']:not(.whj_hoverDisable)"),
      limit = 1)

    var captured = Vector.empty[String]
    rabida(corpus).crawl(job) { (ret, _, pageNo) =>
      ret.foreach { r =>
        // the reference JS-clicks the node and a page.EventWindowOpen
        // listener captures the opened url; statically, the click target is
        // the node's first descendant a[href] resolved against the page (S11)
        val nodeHtml = r.getString(r.fieldIndex("link"))
        val el = graft.html.HtmlParser.parse(nodeHtml)
        val href = el.selfAndDescendants.collectFirst {
          case d if d.attrRaw("href") != null => d.attrRaw("href")
        }.getOrElse("")
        captured :+= graft.urls.Urls.resolve(s"$base/index.html", href)
      }
      pageNo >= job.limit
    }
    assert(captured == Vector(
      "http://mfb.sh.gov.cn/wj/detail_11.html",
      "http://mfb.sh.gov.cn/wj/detail_12.html"))
  }

  // ---- download_file_test.go:16-58 — verbatim url, DownloadFile surface

  test("download-file job: payload lands in out dir, callback gets the path") {
    val url = "http://dnr.sc.gov.cn/scdnr/sctdlwj/2022/1/7/d555de82b08a42fbb7006f4cc567d296/files/8ab0e1fad55c459c9742448b1f975795.pdf"
    val pdfBytes = "%PDF-1.4 fake-but-binary-payload".getBytes("UTF-8")
    val s = spark
    import s.implicits._
    val corpus = Seq((url, new java.sql.Timestamp(0L), pdfBytes, "", ""))
      .toDF("url", "warc_ts", "html", "text", "lang")

    val out = java.nio.file.Files.createTempDirectory("dl-parity").toString
    val job = Job(link = url, cssSelector = Selector())
    var got: Option[String] = None
    new Rabida(spark, corpus, RabiConfig(delay = (0, 0), out = out))
      .downloadFile(job)(f => got = Some(f))
    assert(got.isDefined, "callback must receive the downloaded file path")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(got.get))
    assert(java.util.Arrays.equals(bytes, pdfBytes))
  }

  // ---- anti_detection_test.go:14-50 — stealth-script + UA surface. The
  //      test's observable behavior (inject lib.Script + AntiDetectionJS,
  //      set RandomMacChromeUA) is browser-runtime config: the UA helper
  //      has the same name/shape; stealth scripts ride the strict flag (S5).

  test("anti-detection job: RandomMacChromeUA parity + stealth config carried") {
    val ua = graft.engine.UserAgents.randomMacChromeUA(42L)
    assert(ua.contains("Macintosh") && ua.contains("Chrome/"))
    assert(graft.engine.UserAgents.randomMacChromeUA(42L) == ua) // deterministic
    assert(!RabiConfig().strict)
    assert(RabiConfig.loadFromEnv(Map("RABI_STRICT" -> "true")).strict)
  }

  // ---- new-feature parity: Concurrency knob (config/config.go:17-18)

  test("politeness concurrency=2: wave scheduling, gap between waves only") {
    import org.apache.spark.sql.functions._
    import graft.engine.Politeness
    val s = spark
    import s.implicits._
    val rows = (0 until 6).map(i => (f"http://h1.test/p$i%02d.html", "h1.test", 7L))
    val df = rows.toDF("url", "host", "url_hash")
    val paced = Politeness.schedule(df, Politeness.Config(delayMinMs = 100, delayMaxMs = 100, concurrency = 2))
      .orderBy("url").select("scheduled_ms").collect().map(_.getLong(0)).toVector
    assert(paced == Vector(0L, 0L, 100L, 100L, 200L, 200L))
    // c=1 unchanged (the politeness_schedule oracle's formula)
    val c1 = Politeness.schedule(df, Politeness.Config(delayMinMs = 100, delayMaxMs = 100))
      .orderBy("url").select("scheduled_ms").collect().map(_.getLong(0)).toVector
    assert(c1 == Vector(0L, 100L, 200L, 300L, 400L, 500L))
  }

  // ---- new-feature parity: cookie parse (lib/cookies.go:14-48)

  test("cookie parse: Go http.Request.Cookies semantics + CookieAction defaults") {
    import graft.engine.Cookies
    assert(Cookies.parse("a=1; b=2") == Seq(("a", "1"), ("b", "2")))
    assert(Cookies.parse("""q="quoted value"; plain=x""") == Seq(("q", "quoted value"), ("plain", "x")))
    assert(Cookies.parse("noval; =skipme; ok=yes") == Seq(("noval", ""), ("ok", "yes")))
    assert(Cookies.parse("") == Nil)
    val jar = Cookies.forJob("https://you.ctrip.com/sight/x.html", "sid=abc; uid=42", expire = 0)
    assert(jar == Seq(
      Cookies.Cookie("sid", "abc", "you.ctrip.com", 360 * 24),
      Cookies.Cookie("uid", "42", "you.ctrip.com", 360 * 24)))
    assert(Cookies.forJob("http://x.test/", "k=v", expire = 5).head.expiresHours == 5)
  }

  // ---- new-feature parity: per-page time budget (svcimpl.go:321-327)

  test("per-page time budget: pathological page becomes an error row, stage survives") {
    // ~200k elements: way past a 1ms budget, parsed fine without one
    val big = "<html><body>" + "<div><span>x</span></div>" * 100000 + "</body></html>"
    val corpus = corpusOf("http://slow.test/a.html" -> big,
      "http://slow.test/b.html" -> "<html><body><ul id='l'><li>fast</li></ul></body></html>")
    val s = spark
    import s.implicits._
    val seeds = Seq(("s0", "http://slow.test/a.html"), ("s1", "http://slow.test/b.html"))
    val cr = new graft.engine.Crawler(spark, corpus,
      graft.engine.Crawler.Config(timeBudgetMs = 1L, maxRounds = 1))
    val job = Job(link = "", cssSelector = Selector(scope = "ul > li", attrs = Some(Map(
      "t" -> Selector()))))
    val out = cr.run(job, seeds.toDF("seed_id", "url")
        .withColumn("page_no", org.apache.spark.sql.functions.lit(1))
        .withColumn("cursor", org.apache.spark.sql.functions.lit(0)),
      scroll = false, mode = JsProperty)
      .select("url", "error").distinct().collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("http://slow.test/a.html").exists(_.contains("timeout")),
      s"big page must hit the budget, got ${out("http://slow.test/a.html")}")
    // NOTE: the budget is armed per page, so the small page may or may not
    // finish in 1ms on a loaded box — only assert the stage survived
    assert(out.contains("http://slow.test/b.html"))
  }

  // ---- new-feature parity: StartPageBtn accepts xpath (chromedp.BySearch)

  test("start-page-btn: xpath selector resolves the entry click target") {
    val corpus = corpusOf(
      "http://btn.test/home.html" ->
        """<html><body><div class="entry"><a id="go" href="list.html">进入列表</a></div></body></html>""",
      "http://btn.test/list.html" ->
        """<html><body><ul id="l"><li>item A</li><li>item B</li></ul></body></html>""")
    val job = Job(
      link = "http://btn.test/home.html",
      cssSelector = Selector(scope = "#l > li", attrs = Some(Map("t" -> Selector()))),
      startPageBtn = Selector(xpath = "//div[@class='entry']/a"))
    var got = Vector.empty[String]
    rabida(corpus).crawl(job) { (ret, _, _) =>
      got = ret.map(r => r.getString(r.fieldIndex("t"))).toVector
      true
    }
    assert(got == Vector("item A", "item B"))
  }
}

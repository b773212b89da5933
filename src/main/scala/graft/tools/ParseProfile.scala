package graft.tools

import graft.corpus.Fixtures
import graft.extract._

/** Micro-profile of the per-page hot path (no Spark): phase timings for
  * parse / extract / paginate over the list fixture page.
  */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val doc = Fixtures.Doc(7L, "one two three four five six seven eight nine ten eleven", "en")
    val pages = Fixtures.pagesForDoc(doc)
    val listPage = pages.find(_.url.contains("/list/p1")).get
    val html = new String(listPage.html, "UTF-8")
    val job = graft.CrawlQueries.listJob
    val n = 200000

    def bench(name: String)(f: => Any): Unit = {
      // warmup
      var i = 0
      while (i < 20000) { f; i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f; i += 1 }
      val us = (System.nanoTime() - t0) / 1000.0 / n
      println(f"$name%-28s ${us}%8.2f us/page  (${1e6 / us}%.0f pages/s/core)")
    }

    bench("parse only")(HtmlParser_parse(html))
    val parsed = Extractor.parseDocument(html)
    bench("extract only (parsed)")(Extractor.extractPage(parsed, job, 1, listPage.url, JsProperty))
    bench("parse + extract") {
      val d = Extractor.parseDocument(html)
      Extractor.extractPage(d, job, 1, listPage.url, JsProperty)
    }
    val itemType = SchemaCompiler.itemType(job.cssSelector)
    val (items, _) = Extractor.extractPage(parsed, job, 1, listPage.url, JsProperty)
    bench("toCatalyst only")(Extractor.itemsToCatalyst(items, itemType))
  }

  private def HtmlParser_parse(html: String) = graft.html.HtmlParser.parse(html)
}

package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.html.{HElem, Text}
import graft.extract.Extractor

/** Main-content (boilerplate-removal) extraction — the canonical
  * html→training-text operator of a web-scale corpus pipeline. The
  * heuristic is the public text-density family (Arc90 Readability's
  * link-density scoring, Kohlschütter et al.'s densitometric features),
  * made deterministic:
  *
  *   for every block-level candidate element,
  *     ownText  = innerText length of the subtree
  *     linkText = Σ innerText length of its <a> descendants
  *     score    = (ownText - linkText)² / (ownText + 1)
  *
  *   i.e. non-link text mass × non-link density — navigation/pagination
  *   blocks (text mostly inside links) score ~0; content blocks score
  *   ≈ their text mass. Highest score wins; document order breaks ties,
  *   so the outcome is a pure function of the page bytes.
  *
  * Spark surface: one UDF pass per page (same one-parse discipline as the
  * crawl expression); map-only, no shuffle — at 10^10 pages this is a
  * scan-shaped stage limited by parse throughput.
  */
object MainContent {

  private val BlockTags: Set[String] = Set(
    "div", "ul", "ol", "table", "section", "article", "main", "td", "li", "body")

  private def textLen(e: HElem): Int = Text.innerText(e).length

  def extractMainText(html: Array[Byte]): String = {
    val doc = Extractor.parseDocument(new String(html, java.nio.charset.StandardCharsets.UTF_8))
    var best: HElem = null
    var bestScore = -1.0
    doc.descendants.foreach { e =>
      if (BlockTags(e.tag)) {
        val own = textLen(e)
        val link = e.descendants.filter(_.tag == "a").map(textLen).sum
        val nonLink = math.max(own - link, 0)
        val score = nonLink.toDouble * nonLink / (own + 1)
        if (score > bestScore) { bestScore = score; best = e } // strict: first-in-doc wins ties
      }
    }
    if (best == null) "" else Text.innerText(best)
  }

  val mainTextUdf: Column => Column = {
    val f = udf { (html: Array[Byte]) => if (html == null) "" else extractMainText(html) }
    (c: Column) => f(c)
  }

  /** Main text per page of a crawl corpus frame (url, html, ...). */
  def mainText(corpus: DataFrame): DataFrame =
    corpus.select(col("url"), mainTextUdf(col("html")).as("main_text"))
}

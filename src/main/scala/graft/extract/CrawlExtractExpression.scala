package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Expression` evaluating one page's full crawl step:
  * selector-tree extraction + pagination-link discovery + paginate-condition
  * + scroll-cursor accounting, in ONE call per row (one HTML parse per page
  * — the reference instead pays a CDP round-trip per node per attr,
  * `/root/reference/svcimpl.go:712-797`, its dominant cost; SURVEY.md §3.1).
  *
  * A native expression (not a Scala UDF) so the job config rides in the
  * expression tree, null handling is explicit, and the output is produced
  * directly as InternalRow/ArrayData with no extra encoder hop.
  * CodegenFallback: the body is a tree-walk interpreter — codegen'ing it
  * would inline nothing; all surrounding operators stay in whole-stage
  * codegen.
  *
  * Output struct:
  *   items          array<compiled item type>  — extracted records, doc order
  *   next_page_url  string                     — absolutized, "" if none
  *   n_scope        int                        — scope-node count (scroll cursor)
  *   paginate_goon  boolean                    — paginateCondition verdict
  *   error          string                     — recover()-style error capture
  */
case class CrawlExtractExpression(
    htmlExpr: Expression,
    urlExpr: Expression,
    pageNoExpr: Expression,
    cursorExpr: Expression,
    iframeHtmlExpr: Expression,
    job: Job,
    mode: AttrMode,
    scroll: Boolean,
    timeBudgetMs: Long
) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(htmlExpr, urlExpr, pageNoExpr, cursorExpr, iframeHtmlExpr)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(htmlExpr = newChildren(0), urlExpr = newChildren(1), pageNoExpr = newChildren(2),
      cursorExpr = newChildren(3), iframeHtmlExpr = newChildren(4))

  override def nullable: Boolean = false

  val itemType: DataType = SchemaCompiler.itemType(job.cssSelector)

  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(itemType, containsNull = false), nullable = false),
    StructField("next_page_url", StringType, nullable = false),
    StructField("n_scope", IntegerType, nullable = false),
    StructField("paginate_goon", BooleanType, nullable = false),
    StructField("error", StringType, nullable = true)
  ))

  override def eval(input: InternalRow): Any = {
    val htmlV = htmlExpr.eval(input)
    val urlV = urlExpr.eval(input)
    val pageNo = pageNoExpr.eval(input) match { case i: Int => i; case l: Long => l.toInt; case _ => 1 }
    val cursor = cursorExpr.eval(input) match { case i: Int => i; case l: Long => l.toInt; case _ => 0 }
    val url = if (urlV == null) "" else urlV.toString

    if (htmlV == null)
      return result(Vector.empty, "", 0, goon = false, "page not found in corpus")

    // `r.extract` wraps panics into errors (`svcimpl.go:851-861`); one bad
    // page must never fail the stage (SURVEY.md L13). The per-page time
    // budget (L12, `svcimpl.go:321-327`) is armed around the whole step —
    // Deadline.Exceeded lands in the same recover path as an error row.
    graft.html.Deadline.arm(timeBudgetMs)
    try {
      val htmlStr = htmlV match {
        case b: Array[Byte]  => new String(b, java.nio.charset.StandardCharsets.UTF_8)
        case s: UTF8String   => s.toString
        case other           => other.toString
      }
      val doc = Extractor.parseDocument(htmlStr)
      // cross-document iframe: the crawler joins the framed page's html in
      // when the job scopes into an iframe whose element carries only a src
      val framed: Option[graft.html.HElem] =
        if (!job.cssSelector.iframe) None
        else iframeHtmlExpr.eval(input) match {
          case null              => None
          case b: Array[Byte]    => Some(Extractor.parseDocument(b))
          case s: UTF8String     => Some(Extractor.parseDocument(s.toString))
          case other             => Some(Extractor.parseDocument(other.toString))
        }
      val (items, nScope) =
        if (scroll) Extractor.extractScrollPage(doc, job, url, mode, cursor, framed)
        else (Extractor.extractPage(doc, job, pageNo, url, mode, framed)._1, 0)
      val nextUrl = nextPageUrl(doc, job, pageNo, url, mode)
      // last-page guard L3 (`svcimpl.go:442-447,589-599`): condition read
      // against the (possibly iframe-scoped) page
      val condCtx = Extractor.iframeFather(doc, job.cssSelector).getOrElse(doc)
      val goon =
        try Extractor.execEventCondition(condCtx, job.paginatorCondition)
        catch { case _: Exception => false }
      val abs = if (nextUrl.nonEmpty) graft.urls.Urls.resolve(url, nextUrl) else ""
      result(items, abs, nScope, goon, null)
    } catch {
      case e: Exception =>
        result(Vector.empty, "", 0, goon = false, Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    } finally graft.html.Deadline.disarm()
  }

  /** Pagination-link discovery (L4/L6, SURVEY.md §2.3).
    *
    * The reference has two mechanisms: (a) `nextPageUrl` *extraction* —
    * xpath `FindOne(doc, p.Xpath)`, or css only when BOTH `Paginator.Css`
    * and `Paginator.Attr` are set (`svcimpl.go:872-885`); and (b) the
    * actual *navigation* — a JS click on the first node matching the
    * paginator (`svcimpl.go:449-465`). On a static corpus the click's
    * target URL is the matched element's `href` (or its first descendant
    * `a[href]`'s — the common `<li><a href>` pattern); click-without-href
    * JS pagination is inherently dynamic and yields "" (flagged via the
    * empty successor, SURVEY.md L4).
    */
  private def nextPageUrl(doc: graft.html.HElem, job: Job, pageNo: Int, baseUrl: String, mode: AttrMode): String = {
    val p0 = job.resolvedPaginator(pageNo)
    // the reference's click resolves via chromedp.BySearch, which accepts an
    // xpath in the Css field too (`iframe_test.go:79` does exactly that) —
    // dispatch on the leading '/'
    val p = if (p0.xpath.isEmpty && p0.css.startsWith("/")) p0.copy(xpath = p0.css, css = "") else p0
    if (p.xpath.nonEmpty) {
      if (graft.xpath.XPathAttr.isAttrPath(p.xpath))
        try graft.xpath.XPathAttr.findOne(doc, p.xpath) catch { case _: Exception => "" }
      else {
        graft.xpath.XPath.find(doc, p.xpath).collectFirst { case e: graft.html.HElem => e }
          .map(clickTargetHref).getOrElse("")
      }
    } else if (p.css.nonEmpty) {
      if (p.attr.nonEmpty)
        graft.css.Css.selectFirst(doc, p.css).map(Extractor.readAttr(_, p.attr, baseUrl, mode)).getOrElse("")
      else
        graft.css.Css.selectFirst(doc, p.css).map(clickTargetHref).getOrElse("")
    } else ""
  }

  private def clickTargetHref(e: graft.html.HElem): String =
    e.attr("href").orElse {
      e.selfAndDescendants.collectFirst {
        case d if d.attrRaw("href") != null => d.attrRaw("href")
      }
    }.getOrElse("")

  private def result(items: Vector[XVal], nextUrl: String, nScope: Int, goon: Boolean, error: String): InternalRow =
    new GenericInternalRow(Array[Any](
      Extractor.itemsToCatalyst(items, itemType),
      UTF8String.fromString(nextUrl),
      nScope,
      goon,
      if (error == null) null else UTF8String.fromString(error)
    ))
}

object CrawlExtractExpression {
  import org.apache.spark.sql.functions.lit
  import org.apache.spark.sql.{GraftSqlBridge => ExpressionUtils}

  /** Column API: `crawl_extract($"html", $"url", $"page_no", $"cursor")`. */
  def apply(html: Column, url: Column, pageNo: Column, cursor: Column, job: Job,
            mode: AttrMode = JsProperty, scroll: Boolean = false,
            iframeHtml: Column = lit(null), timeBudgetMs: Long = 0L): Column = {
    ExpressionUtils.column(CrawlExtractExpression(
      ExpressionUtils.expression(html), ExpressionUtils.expression(url),
      ExpressionUtils.expression(pageNo), ExpressionUtils.expression(cursor),
      ExpressionUtils.expression(iframeHtml),
      job, mode, scroll, timeBudgetMs))
  }

  def apply(html: Column, url: Column, job: Job): Column =
    apply(html, url, lit(1), lit(0), job)
}

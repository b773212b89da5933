package graft.extract

import graft.html._
import graft.css.Css
import graft.xpath.{XPath, XPathAttr}
import graft.urls.Urls

/** Dynamic extracted values — the Scala image of the reference's
  * `[]interface{}` of string | map[string]interface{} | nested lists
  * (`/root/reference/svcimpl.go:690-798`).
  */
sealed trait XVal extends Serializable
final case class XStr(s: String) extends XVal
final case class XRec(fields: Map[String, XVal]) extends XVal
final case class XList(items: Vector[XVal]) extends XVal

/** Selector-tree evaluator over one parsed page. Pure function of
  * (html, url, selector, mode): re-expresses the reference's imperative
  * CDP-round-trip loops (`svcimpl.go:690-848`) as a single in-memory tree
  * walk — one parse per page, invoked once per row from the extraction
  * expression (SURVEY.md §1.2 "row vs columnar").
  *
  * Semantics matrix reproduced exactly (SURVEY.md §2.2):
  *   P1 scope select-all (default "html" at top), P2 innerText(self),
  *   P3 concat-all innerText over Css matches, P4 JS-property attr of first
  *   match (href/src absolutized) vs C3 raw DOM attr in smooth mode,
  *   P5 outerHTML/innerHTML, P6 `node` handle → serialized element,
  *   P7 zero-value drop, P8 record assembly + empty-record drop,
  *   P9-P11 xpath scope/leaf/concat, P12 iframe father scoping.
  */
object Extractor {

  /** Parse page bytes into a #document-rooted tree (so `scope="html"` and
    * absolute xpaths resolve like Chrome's document).
    */
  def parseDocument(html: String): HElem = {
    val root = HtmlParser.parse(html)
    val doc = HElem("#document")
    doc.append(root)
    doc
  }

  def parseDocument(html: Array[Byte]): HElem =
    parseDocument(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  /** `svcimpl.go:638-656` iframe: resolve the father node. On a static
    * corpus the iframe subtree is either inlined (SURVEY.md P12) or, for a
    * cross-document iframe (`src` pointing at another corpus url), the
    * framed page is joined in by the crawler and its parsed document
    * replaces the empty iframe element as the extraction context — see
    * [[resolveIframeContext]].
    */
  def iframeFather(doc: HElem, sel: Selector): Option[HElem] =
    if (!sel.iframe) None
    else sel.iframeSelector match {
      case Some(isel) =>
        val q = isel.cssOrXpath
        if (q.startsWith("/")) XPath.find(doc, q).collectFirst { case e: HElem => e }
        else Css.selectFirst(doc, q)
      case None => Css.selectFirst(doc, "iframe")
    }

  /** Cross-document iframe (reference: chromedp switches into the frame's
    * own document, `svcimpl.go:638-656`): when the matched iframe element
    * has no inlined content and the crawler supplied the framed page,
    * extraction scopes against the framed DOCUMENT (so scopes like
    * `body > form > table` resolve as they would inside the live frame).
    */
  def resolveIframeContext(doc: HElem, sel: Selector, framed: Option[HElem]): Option[HElem] =
    iframeFather(doc, sel) match {
      case Some(el) if framed.isDefined && !el.children.exists(_.isInstanceOf[HElem]) => framed
      case other => other
    }

  /** Top-level extraction for one page: the body of `r.extract`
    * (`svcimpl.go:850-888`) minus browser plumbing. Returns (items,
    * nextPageUrl).
    */
  def extractPage(doc: HElem, job: Job, pageNo: Int, baseUrl: String, mode: AttrMode,
                  framed: Option[HElem] = None): (Vector[XVal], String) = {
    val father = resolveIframeContext(doc, job.cssSelector, framed)
    val p = job.resolvedPaginator(pageNo)
    if (job.cssSelector.isXpath) {
      // xpath path works on the (possibly iframe-scoped) document snapshot
      val ctx = father.getOrElse(doc)
      val items = populateX(job.cssSelector, ctx)
      val nextUrl =
        if (p.xpath.nonEmpty) tryOrEmpty(XPathAttr.findOne(ctx, p.xpath))
        else ""
      (items, nextUrl)
    } else {
      val items = populate(father.orNull, job.cssSelector, doc, baseUrl, mode)
      val nextUrl =
        if (p.css.nonEmpty && p.attr.nonEmpty)
          Css.selectFirst(doc, p.css).map(e => readAttr(e, p.attr, baseUrl, mode)).getOrElse("")
        else ""
      (items, nextUrl)
    }
  }

  /** Scroll variant: also returns the next cursor = count of scope nodes
    * matched this round (`svcimpl_scroll.go:430-448`); caller adds the old
    * cursor (`svcimpl_scroll.go:426`).
    */
  def extractScrollPage(doc: HElem, job: Job, baseUrl: String, mode: AttrMode, cursor: Int,
                        framed: Option[HElem] = None): (Vector[XVal], Int) = {
    val sel0 = job.cssSelector
    // cursor rewrite (`svcimpl_scroll.go:363-372`): css scope →
    // `orig:nth-child(n+cursor+1)`; xpath scope → CursorScopeByPosition.
    val sel =
      if (cursor <= 0) sel0
      else if (sel0.scope.nonEmpty) sel0.copy(scope = s"${sel0.scope}:nth-child(n+${cursor + 1})")
      else if (sel0.xpathScope.nonEmpty) sel0.copy(xpathScope = XPathAttr.cursorScopeByPosition(sel0.xpathScope, cursor + 1))
      else sel0
    val father = resolveIframeContext(doc, sel, framed)
    if (sel.isXpath) {
      val ctx = father.getOrElse(doc)
      val scopeNodes =
        if (sel.xpathScope.nonEmpty) XPath.find(ctx, sel.xpathScope).collect { case e: HElem => e }
        else Vector(ctx)
      (populateX(sel, ctx), scopeNodes.length)
    } else {
      val scope = effectiveScope(sel, father.orNull)
      val ctx = father.getOrElse(doc)
      val nodes = if (scope.nonEmpty) tryCss(ctx, scope) else Vector(ctx)
      (populate(father.orNull, sel, doc, baseUrl, mode), nodes.length)
    }
  }

  private def effectiveScope(sel: Selector, father: HElem): String =
    if (sel.scope.isEmpty && father == null) "html" else sel.scope

  private def tryCss(ctx: HElem, selector: String): Vector[HElem] =
    try Css.selectAll(ctx, selector)
    catch { case _: Css.CssParseException => Vector.empty } // scope err logged + empty (svcimpl.go:701)

  private def tryCssFirst(ctx: HElem, selector: String): Option[HElem] =
    try Css.selectFirst(ctx, selector)
    catch { case _: Css.CssParseException => None }

  private def tryOrEmpty(f: => String): String =
    try f catch { case _: Exception => "" }

  // ------------------------------------------------------------- CSS path

  /** `svcimpl.go:690-798` populate. `father == null` ⇒ document context with
    * default scope "html".
    */
  def populate(father: HElem, sel: Selector, doc: HElem, baseUrl: String, mode: AttrMode): Vector[XVal] = {
    val scope = effectiveScope(sel, father)
    val ctx = if (father != null) father else doc
    val nodes: Vector[HElem] =
      if (scope.nonEmpty) tryCss(ctx, scope)
      else Vector(father) // father != null here by construction
    val out = Vector.newBuilder[XVal]
    nodes.foreach { node =>
      sel.attrs match {
        case None =>
          // `Before` events are DOM-mutating → static no-op (SURVEY.md P13);
          // their conditions are evaluated for lineage-parity only.
          val value = leafValue(node, sel, baseUrl, mode)
          // P7 zero-value drop (`svcimpl.go:775-777`)
          if (value.nonEmpty) out += XStr(value)
        case Some(attrMap) =>
          // P8 record assembly (`svcimpl.go:779-795`)
          val data = scala.collection.mutable.Map[String, XVal]()
          attrMap.foreach { case (attrName, sub) =>
            val result = populate(node, sub, doc, baseUrl, mode)
            if (result.nonEmpty) {
              if (sub.scope.isEmpty) data(attrName) = result.head
              else data(attrName) = XList(result)
            }
          }
          if (data.nonEmpty) out += XRec(data.toMap)
      }
    }
    out.result()
  }

  /** Leaf read: the attr/css dispatch of `svcimpl.go:718-774`. */
  private def leafValue(node: HElem, sel: Selector, baseUrl: String, mode: AttrMode): String = {
    if (sel.attr.isEmpty) {
      if (sel.css.isEmpty) Text.innerText(node) // P2
      else {
        // P3: concat innerText over ALL matches, document order
        tryCss(node, sel.css).map(Text.innerText).mkString("")
      }
    } else {
      if (sel.css.isEmpty) {
        sel.attr match {
          case "outerHTML" => Serializer.outerHtml(node)
          case "innerHTML" => Serializer.innerHtml(node)
          case "node"      => Serializer.outerHtml(node) // P6: static stand-in for *cdp.Node
          case a           => readAttr(node, a, baseUrl, mode)
        }
      } else {
        // first-match semantics short-circuit the CSS walk (selectFirst)
        // instead of materializing every match
        sel.attr match {
          case "outerHTML" => tryCssFirst(node, sel.css).map(Serializer.outerHtml).getOrElse("")
          case "innerHTML" => tryCssFirst(node, sel.css).map(Serializer.innerHtml).getOrElse("")
          case "innerText" => tryCss(node, sel.css).map(Text.innerText).mkString("")
          case "node"      => tryCssFirst(node, sel.css).map(Serializer.outerHtml).getOrElse("")
          case a           => tryCssFirst(node, sel.css).map(readAttr(_, a, baseUrl, mode)).getOrElse("")
        }
      }
    }
  }

  /** JS-property vs raw-DOM-attribute read (C3). In JsProperty mode href/src
    * come back absolutized (what `JavascriptAttribute` observes in Chrome);
    * innerText reads the rendered text property.
    */
  def readAttr(e: HElem, attr: String, baseUrl: String, mode: AttrMode): String = mode match {
    case DomAttribute => e.attr(attr).getOrElse("")
    case JsProperty =>
      attr match {
        case "innerText"          => Text.innerText(e)
        case "textContent"        => Text.rawText(e)
        case "href" | "src"       => e.attr(attr).map(Urls.resolve(baseUrl, _)).getOrElse("")
        case a                    => e.attr(a).getOrElse("")
      }
  }

  // ----------------------------------------------------------- XPath path

  /** `svcimpl.go:800-811` populateX. */
  def populateX(sel: Selector, node: HElem): Vector[XVal] = {
    if (sel.xpathScope.nonEmpty) {
      val nodes = XPath.find(node, sel.xpathScope).collect { case e: HElem => e }
      nodes.flatMap(n => recursivePopulateX(sel, n))
    } else recursivePopulateX(sel, node)
  }

  /** `svcimpl.go:813-836` recursivePopulateX. */
  private def recursivePopulateX(sel: Selector, node: HElem): Vector[XVal] = {
    sel.attrs match {
      case None =>
        val value = retrieveByXpath(sel, node)
        if (value.nonEmpty) Vector(XStr(value)) else Vector.empty
      case Some(attrMap) =>
        val data = scala.collection.mutable.Map[String, XVal]()
        attrMap.foreach { case (attrName, sub) =>
          val result = populateX(sub, node)
          if (result.nonEmpty) {
            if (sub.xpathScope.isEmpty) data(attrName) = result.head
            else data(attrName) = XList(result)
          }
        }
        if (data.nonEmpty) Vector(XRec(data.toMap)) else Vector.empty
    }
  }

  /** `svcimpl.go:838-848` retrieveByXpath — note the deliberate re-application
    * of XpathScope beneath each scope node, faithful to the reference.
    */
  private def retrieveByXpath(sel: Selector, node: HElem): String = {
    if (sel.xpathScope.nonEmpty) {
      val nodes = XPath.find(node, sel.xpathScope).collect { case e: HElem => e }
      nodes.map(n => XPathAttr.findOne(n, sel.xpath)).mkString("")
    } else XPathAttr.findOne(node, sel.xpath)
  }

  // ------------------------------------------------------------ condition

  /** `svcimpl.go:601-630` ExecEventCondition: nil/empty-value condition ⇒
    * true; TextEvent reads innerText of first match; GetAttributeValueEvent
    * reads the raw DOM attribute; then the user CheckFunc decides.
    */
  def execEventCondition(ctx: HElem, condition: Option[Condition]): Boolean =
    condition match {
      case None                          => true
      case Some(c) if c.value.isEmpty    => true
      case Some(c) =>
        c.execType match {
          case TextEvent =>
            val q = c.execSelector.cssOrXpath
            val text = Css.selectFirst(ctx, q).map(Text.innerText).getOrElse {
              throw new NoSuchElementException(s"condition css err: $q")
            }
            c.checkFunc(text, c.value)
          case GetAttributeValueEvent =>
            val text = Css.selectFirst(ctx, c.execSelector.css)
              .flatMap(_.attr(c.execSelector.attr)).getOrElse {
                // AttributeValue on a found node with absent attr yields ""
                if (Css.selectFirst(ctx, c.execSelector.css).isDefined) ""
                else throw new NoSuchElementException(s"condition css: ${c.execSelector.css}")
              }
            c.checkFunc(text, c.value)
          case _ => true
        }
    }

  // ----------------------------------------------------- catalyst bridge

  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  /** Convert an XVal to the Catalyst value of the compiled type. */
  def toCatalyst(v: XVal, dt: DataType): Any = (v, dt) match {
    case (XStr(s), StringType) => UTF8String.fromString(s)
    case (XRec(fields), st: StructType) =>
      val arr = new Array[Any](st.fields.length)
      var i = 0
      st.fields.foreach { f =>
        arr(i) = fields.get(f.name) match {
          case Some(fv) => toCatalyst(fv, f.dataType)
          case None     => null
        }
        i += 1
      }
      new GenericInternalRow(arr)
    case (XList(items), ArrayType(et, _)) =>
      new GenericArrayData(items.map(toCatalyst(_, et)).toArray)
    // a scalar landing where a list is expected (scope present but single
    // value semantics) — wrap; and vice versa take head
    case (x, ArrayType(et, _))    => new GenericArrayData(Array(toCatalyst(x, et)))
    case (XList(items), et)       => items.headOption.map(toCatalyst(_, et)).orNull
    case (XRec(_), StringType)    => null
    case (XStr(s), _)             => UTF8String.fromString(s)
    case _                        => null
  }

  def itemsToCatalyst(items: Vector[XVal], itemType: DataType): GenericArrayData =
    new GenericArrayData(items.map(toCatalyst(_, itemType)).toArray)
}

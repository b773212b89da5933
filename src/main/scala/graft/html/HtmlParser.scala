package graft.html

import scala.collection.mutable.ArrayBuffer

/** From-scratch lenient HTML5-ish parser.
  *
  * The sandbox has no jsoup / no HTML library (coursier offline), so this is
  * the equivalent of the parse step the reference gets from Chrome's DOM and
  * from `htmlquery.Parse` (`/root/reference/svcimpl.go:903`). Handles:
  * unclosed tags, void elements, implicit `<li>/<p>/<td>/<tr>` closing,
  * raw-text elements (script/style/textarea/title), comments, doctype,
  * character entities, quoted/unquoted/valueless attributes, and stray `</x>`.
  *
  * Output is always a document rooted at an `html` element containing `head`
  * and `body` (matching what `golang.org/x/net/html` synthesizes), so the
  * reference's default scope `"html"` (`/root/reference/svcimpl.go:692-694`)
  * resolves identically.
  */
object HtmlParser {

  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private val rawTextElements: Set[String] = Set("script", "style", "textarea", "title")

  /** Tags whose open implicitly closes certain open tags (leniency subset). */
  private val impliedEndByOpen: Map[String, Set[String]] = Map(
    "li" -> Set("li"),
    "p" -> Set("p"),
    "tr" -> Set("tr", "td", "th"),
    "td" -> Set("td", "th"),
    "th" -> Set("td", "th"),
    "option" -> Set("option"),
    "dt" -> Set("dt", "dd"),
    "dd" -> Set("dt", "dd"),
    // Block-level elements implicitly close an open <p>.
    "div" -> Set("p"), "ul" -> Set("p"), "ol" -> Set("p"), "table" -> Set("p"),
    "section" -> Set("p"), "article" -> Set("p"), "blockquote" -> Set("p"),
    "h1" -> Set("p"), "h2" -> Set("p"), "h3" -> Set("p"),
    "h4" -> Set("p"), "h5" -> Set("p"), "h6" -> Set("p")
  )

  private val headOnly: Set[String] = Set("title", "meta", "link", "base", "style")

  def parse(html: String): HElem = {
    val tokens = tokenize(html)
    build(tokens)
  }

  def parse(html: Array[Byte]): HElem =
    parse(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  // ---------------------------------------------------------------- tokens

  sealed trait Tok
  private final case class TText(s: String) extends Tok
  private final case class TOpen(tag: String, attrs: ArrayBuffer[(String, String)], selfClose: Boolean) extends Tok
  private final case class TClose(tag: String) extends Tok
  private final case class TComment(s: String) extends Tok

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** case-insensitive indexOf without copying the document. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = from
    val limit = s.length - needle.length
    while (i <= limit) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def tokenize(s: String): ArrayBuffer[Tok] = {
    val out = ArrayBuffer[Tok]()
    val n = s.length
    var i = 0
    val text = new java.lang.StringBuilder
    def flushText(): Unit = {
      if (text.length > 0) { out += TText(Entities.decode(text.toString)); text.setLength(0) }
    }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n) {
        Deadline.check() // cooperative per-page extraction budget (L12)
        val c1 = s.charAt(i + 1)
        if (c1 == '!') {
          flushText()
          if (s.startsWith("<!--", i)) {
            val end = s.indexOf("-->", i + 4)
            val stop = if (end < 0) n else end
            out += TComment(s.substring(i + 4, stop))
            i = if (end < 0) n else end + 3
          } else {
            // doctype or bogus declaration: skip to '>'
            val end = s.indexOf('>', i)
            i = if (end < 0) n else end + 1
          }
        } else if (c1 == '/') {
          if (i + 2 < n && isAsciiLetter(s.charAt(i + 2))) {
            flushText()
            var j = i + 2
            while (j < n && s.charAt(j) != '>') j += 1
            val name = s.substring(i + 2, j).trim.toLowerCase
            if (name.nonEmpty) out += TClose(name.takeWhile(ch => !ch.isWhitespace))
            i = if (j < n) j + 1 else n
          } else { text.append(c); i += 1 }
        } else if (isAsciiLetter(c1)) {
          flushText()
          val (tok, next) = readOpenTag(s, i)
          out += tok
          i = next
          // Raw text elements: consume until the matching close tag verbatim.
          tok match {
            case TOpen(tag, _, false) if rawTextElements(tag) =>
              val closeSeq = "</" + tag
              var j = indexOfIgnoreCase(s, closeSeq, i)
              if (j < 0) j = n
              val raw = s.substring(i, j)
              if (raw.nonEmpty)
                out += TText(if (tag == "textarea" || tag == "title") Entities.decode(raw) else raw)
              if (j < n) {
                val gt = s.indexOf('>', j)
                out += TClose(tag)
                i = if (gt < 0) n else gt + 1
              } else i = n
            case _ =>
          }
        } else { text.append(c); i += 1 }
      } else { text.append(c); i += 1 }
    }
    flushText()
    out
  }

  private def readOpenTag(s: String, start: Int): (TOpen, Int) = {
    val n = s.length
    var i = start + 1
    val nameStart = i
    while (i < n && (isAsciiLetter(s.charAt(i)) || s.charAt(i).isDigit || s.charAt(i) == '-')) i += 1
    val tag = s.substring(nameStart, i).toLowerCase
    val attrs = ArrayBuffer[(String, String)]()
    var selfClose = false
    var done = false
    while (!done && i < n) {
      // skip whitespace
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else s.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && s.charAt(i + 1) == '>') { selfClose = true; i += 2; done = true }
          else i += 1
        case _ =>
          // attribute name
          val an = i
          while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '=' && s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
          val name = s.substring(an, i).toLowerCase
          while (i < n && s.charAt(i).isWhitespace) i += 1
          if (i < n && s.charAt(i) == '=') {
            i += 1
            while (i < n && s.charAt(i).isWhitespace) i += 1
            if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
              val q = s.charAt(i); i += 1
              val vs = i
              while (i < n && s.charAt(i) != q) i += 1
              val v = s.substring(vs, i)
              if (i < n) i += 1
              if (name.nonEmpty) attrs += ((name, Entities.decode(v)))
            } else {
              val vs = i
              while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
              val v = s.substring(vs, i)
              if (name.nonEmpty) attrs += ((name, Entities.decode(v)))
            }
          } else if (name.nonEmpty) attrs += ((name, ""))
      }
    }
    (TOpen(tag, attrs, selfClose), i)
  }

  // ---------------------------------------------------------------- tree

  private def build(tokens: ArrayBuffer[Tok]): HElem = {
    // html/head/body are synthesized like golang.org/x/net/html so xpath
    // `//...` and scope `html` behave the same whether or not the author
    // supplied them (the open/close handlers below fold author-supplied
    // tags into the synthesized skeleton).
    val root = HElem("html")
    val head = HElem("head")
    val body = HElem("body")

    val stack = ArrayBuffer[HElem]()
    var inBodyPhase = false

    def ensureBody(): Unit = {
      if (!inBodyPhase) {
        inBodyPhase = true
        if (root.children.isEmpty || !root.children.exists { case e: HElem => e.tag == "head"; case _ => false })
          root.append(head)
        root.append(body)
      }
    }
    def current: HElem =
      if (stack.nonEmpty) stack.last
      else if (inBodyPhase) body
      else head

    def openTag(tag: String, attrs: ArrayBuffer[(String, String)], selfClose: Boolean): Unit = {
      tag match {
        case "html" =>
          // merge attributes into synthesized root
          ()
        case "head" => ()
        case "body" => ensureBody()
        case _ =>
          if (!inBodyPhase && !headOnly(tag)) ensureBody()
          // implied end tags
          impliedEndByOpen.get(tag).foreach { closes =>
            while (stack.nonEmpty && closes(stack.last.tag)) stack.remove(stack.length - 1)
          }
          // HTML5 tbody synthesis: <tr> directly under <table> gets an
          // implicit tbody (Chrome and golang.org/x/net/html both do this;
          // needed so xpath like //table/tbody/tr matches identically)
          if (tag == "tr" && current.tag == "table") {
            val tb = HElem("tbody")
            current.append(tb)
            stack += tb
          }
          val e = HElem.apply(tag, attrs.toSeq)
          current.append(e)
          if (!selfClose && !voidElements(tag)) stack += e
      }
    }

    def closeTag(tag: String): Unit = {
      tag match {
        case "html" | "head" => if (!inBodyPhase && tag == "head") inBodyPhase = false
        case "body"          => stack.clear()
        case _ =>
          val idx = stack.lastIndexWhere(_.tag == tag)
          if (idx >= 0) stack.remove(idx, stack.length - idx)
        // stray close tag: ignored (leniency)
      }
    }

    tokens.foreach {
      case TText(t) =>
        if (!inBodyPhase && t.trim.nonEmpty && stack.isEmpty) ensureBody()
        if (inBodyPhase || stack.nonEmpty || t.trim.nonEmpty) current.append(new HText(t))
        else if (!inBodyPhase) head.append(new HText(t))
      case TComment(c) => current.append(new HComment(c))
      case TOpen(tag, attrs, sc) => openTag(tag, attrs, sc)
      case TClose(tag) => closeTag(tag)
    }
    if (!inBodyPhase) { // head-only document
      root.append(head); root.append(body); inBodyPhase = true
    }
    root
  }
}

package graft.html

/** The two text-extraction surfaces the reference exposes, pinned to a
  * deterministic spec (SURVEY.md §7 hard part #1):
  *
  *  - [[innerText]] — the CSS extraction path reads Chrome's `innerText`
  *    JS property per node (`/root/reference/svcimpl.go:722,729,760`).
  *    Chrome's algorithm is CSS-aware; we pin the deterministic subset:
  *    whitespace runs collapse to one space, block-level boundaries emit
  *    `\n`, `<br>` emits `\n`, table cells within a row are separated by
  *    `\t`, script/style/head content is skipped, and the final string is
  *    trimmed of leading/trailing whitespace.
  *
  *  - [[rawText]] — the XPath path reads `htmlquery.InnerText`
  *    (`/root/reference/lib/xpath.go:21`), which is the *verbatim*
  *    concatenation of all descendant text nodes — no collapsing, no block
  *    newlines. The two paths genuinely differ in the reference; both are
  *    reproduced here.
  */
object Text {

  private val blockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "details", "dialog", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "ul",
    "tr", "thead", "tbody", "tfoot", "caption")

  private val skipTags: Set[String] = Set("script", "style", "noscript", "template", "head", "title")

  /** Chrome-innerText-like rendering of an element subtree. */
  def innerText(e: HElem): String = {
    val sb = new java.lang.StringBuilder
    // state: 0 = at start / just after newline, 1 = mid-line, 2 = pending space
    render(e, sb, inPre = false, isRoot = true)
    // collapse: we build with explicit markers; final trim
    normalize(sb.toString)
  }

  private def render(n: HNode, sb: java.lang.StringBuilder, inPre: Boolean, isRoot: Boolean = false): Unit = n match {
    case t: HText =>
      if (inPre) sb.append(t.data)
      else {
        // collapse whitespace runs to a single space (newline handling is
        // done at block boundaries, not inside text nodes)
        val d = t.data
        var i = 0
        while (i < d.length) {
          val c = d.charAt(i)
          if (c.isWhitespace) {
            sb.append(' ')
            while (i < d.length && d.charAt(i).isWhitespace) i += 1
          } else { sb.append(c); i += 1 }
        }
      }
    case _: HComment => ()
    case e: HElem =>
      if (skipTags(e.tag)) ()
      else if (e.tag == "br") sb.append('\n')
      else {
        val block = blockTags(e.tag)
        val pre = inPre || e.tag == "pre"
        if (block) sb.append('\n')
        // In Chrome, sibling td/th cells are tab-separated — a separator of
        // the surrounding ROW, so it never applies to the render root
        // (innerText of a lone td has no leading tab).
        if (!isRoot && (e.tag == "td" || e.tag == "th") &&
            e.prevElemSibling.exists(s => s.tag == "td" || s.tag == "th"))
          sb.append('\t')
        e.children.foreach(render(_, sb, pre))
        if (block) sb.append('\n')
      }
  }

  /** Collapse space runs, drop spaces adjacent to newlines/tabs, collapse
    * newline runs, trim.
    */
  private def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') {
        // lookahead: swallow run of spaces; drop entirely if next significant is \n or \t or we're at line start
        var j = i
        while (j < n && s.charAt(j) == ' ') j += 1
        val prev = if (sb.length() == 0) '\n' else sb.charAt(sb.length() - 1)
        val next = if (j < n) s.charAt(j) else '\n'
        if (prev != '\n' && prev != '\t' && next != '\n' && next != '\t') sb.append(' ')
        i = j
      } else if (c == '\n') {
        var j = i
        while (j < n && s.charAt(j) == '\n') j += 1
        if (sb.length() > 0) {
          // trailing newline only if more content follows
          if (j < n) sb.append('\n')
        }
        i = j
      } else { sb.append(c); i += 1 }
    }
    // trim trailing whitespace
    var end = sb.length()
    while (end > 0 && (sb.charAt(end - 1) == '\n' || sb.charAt(end - 1) == ' ' || sb.charAt(end - 1) == '\t')) end -= 1
    sb.substring(0, end)
  }

  /** htmlquery.InnerText parity: verbatim concatenation of descendant text
    * nodes in document order (includes script/style text, like
    * golang.org/x/net/html does).
    */
  def rawText(n: HNode): String = {
    val sb = new java.lang.StringBuilder
    def walk(x: HNode): Unit = x match {
      case t: HText    => sb.append(t.data)
      case _: HComment => ()
      case e: HElem    => e.children.foreach(walk)
    }
    walk(n)
    sb.toString
  }
}

package graft.html

/** outerHTML / innerHTML serialization — the reference exposes both as
  * special-cased leaf attrs (`/root/reference/svcimpl.go:737-742,749-754`).
  * Serialization is canonical (attributes in parse order, double-quoted,
  * entity-encoded), matching how Chrome re-serializes a parsed tree rather
  * than echoing source bytes.
  */
object Serializer {

  def outerHtml(e: HElem): String = {
    val sb = new java.lang.StringBuilder
    writeElem(e, sb)
    sb.toString
  }

  def innerHtml(e: HElem): String = {
    val sb = new java.lang.StringBuilder
    e.children.foreach(write(_, sb))
    sb.toString
  }

  private def write(n: HNode, sb: java.lang.StringBuilder): Unit = n match {
    case t: HText    => sb.append(Entities.encodeText(t.data))
    case c: HComment => sb.append("<!--").append(c.data).append("-->")
    case e: HElem    => writeElem(e, sb)
  }

  private def writeElem(e: HElem, sb: java.lang.StringBuilder): Unit = {
    sb.append('<').append(e.tag)
    e.foreachAttr { (k, v) =>
      sb.append(' ').append(k).append("=\"").append(Entities.encodeAttr(v)).append('"')
    }
    sb.append('>')
    if (!HtmlParser.voidElements(e.tag)) {
      e.children.foreach(write(_, sb))
      sb.append("</").append(e.tag).append('>')
    }
  }
}

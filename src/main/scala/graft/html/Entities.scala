package graft.html

/** HTML character-reference decoding (the common subset; numeric refs in
  * full). Mirrors what both Chrome's DOM and `golang.org/x/net/html` give the
  * reference: text nodes arrive already entity-decoded.
  */
object Entities {

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "frac12" -> "½",
    "sup2" -> "²", "sup3" -> "³", "micro" -> "µ",
    "para" -> "¶", "middot" -> "·", "bull" -> "•",
    "dagger" -> "†", "euro" -> "€", "pound" -> "£",
    "yen" -> "¥", "cent" -> "¢", "sect" -> "§",
    "uml" -> "¨", "ordf" -> "ª", "not" -> "¬",
    "shy" -> "­", "macr" -> "¯", "acute" -> "´",
    "cedil" -> "¸", "ordm" -> "º", "iquest" -> "¿",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
    "darr" -> "↓", "harr" -> "↔")

  /** Decode character references in `s`. Unknown/malformed refs pass through
    * verbatim (browser leniency).
    */
  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 32) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              val cp = Integer.parseInt(body.substring(2), 16)
              sb.appendCodePoint(cp); i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try {
              val cp = Integer.parseInt(body.substring(1))
              sb.appendCodePoint(cp); i = semi + 1
            } catch { case _: Exception => sb.append(c); i += 1 }
          } else named.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None      => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Encode the five XML-significant characters (for serialization). */
  def encodeText(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c   => sb.append(c)
    }
    sb.toString
  }

  def encodeAttr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '"' => sb.append("&quot;")
      case c   => sb.append(c)
    }
    sb.toString
  }
}

package graft.urls

/** URL resolution + canonicalization.
  *
  * Resolution reproduces the JS-property semantics the reference gets from
  * `chromedp.JavascriptAttribute(..., "href")` (`/root/reference/
  * svcimpl.go:770-771`): the browser returns the absolutized URL. The
  * canonical form keys the URL-seen set (SURVEY.md §7 build item 5).
  */
object Urls {

  /** Resolve `ref` against `base` like a browser href property read. */
  def resolve(base: String, ref: String): String = {
    if (ref == null || ref.isEmpty) return ""
    val r = ref.trim
    if (r.startsWith("javascript:") || r.startsWith("#")) return base
    try {
      val b = new java.net.URI(base)
      val resolved = b.resolve(r)
      resolved.toString
    } catch {
      case _: Exception =>
        if (r.startsWith("http://") || r.startsWith("https://")) r else ""
    }
  }

  def host(url: String): String =
    try {
      val h = new java.net.URI(url).getHost
      if (h == null) "" else h.toLowerCase
    } catch { case _: Exception => "" }

  /** Canonicalize for the seen-set: lowercase scheme+host, drop default
    * port, resolve dot-segments, drop fragment, keep query, strip trailing
    * slash on empty path.
    */
  def canonicalize(url: String): String =
    try {
      val u = new java.net.URI(url.trim).normalize()
      val scheme = Option(u.getScheme).map(_.toLowerCase).getOrElse("http")
      val hostL = Option(u.getHost).map(_.toLowerCase).getOrElse("")
      val port = u.getPort match {
        case -1                          => ""
        case 80 if scheme == "http"      => ""
        case 443 if scheme == "https"    => ""
        case p                           => s":$p"
      }
      val path = Option(u.getRawPath).filter(_.nonEmpty).getOrElse("/")
      val query = Option(u.getRawQuery).map("?" + _).getOrElse("")
      s"$scheme://$hostL$port$path$query"
    } catch { case _: Exception => url }

  /** Stable 64-bit hash of the canonical URL (FNV-1a; deterministic across
    * JVMs, unlike String.hashCode's 32 bits for 10^10-URL scale).
    */
  def urlHash(canonical: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Host bucket for frontier partitioning / politeness grouping. */
  def hostBucket(host: String, buckets: Int): Int = {
    val h = urlHash(host)
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }
}

package graft.engine

/** robots.txt gating — a north-rule addition with no reference analog
  * (BASELINE.json north_star; the reference crawls without robots checks).
  *
  * Rules are parsed from corpus rows whose url is `scheme://host/robots.txt`
  * (FIXTURES.md `robots` family) with RFC 9309 semantics as Google's
  * documented implementation refines them:
  *
  *   - group selection: groups are matched against the crawler's product
  *     token case-insensitively; the longest group token that equals or
  *     prefixes the product token wins, and all groups carrying that token
  *     merge. `*` groups apply only when no named group matches.
  *   - rule matching: `*` matches any character run, a trailing `$`
  *     anchors the pattern to the end of the path; the longest matching
  *     pattern wins between Allow and Disallow, Allow winning ties; empty
  *     rule values are ignored (empty Disallow = allow everything).
  *   - `Crawl-delay` (de-facto extension, honored by Bing/Yandex): carried
  *     per group in milliseconds and fed into the politeness scheduler as
  *     a per-host gap floor (`Politeness.schedule`'s robots column).
  */
object Robots {

  final case class Rules(allows: Vector[String], disallows: Vector[String],
                         crawlDelayMs: Option[Long] = None) extends Serializable {
    def isAllowed(path: String): Boolean = {
      val p = if (path.isEmpty) "/" else path
      val bestAllow = allows.iterator.filter(matches(_, p)).map(_.length).maxOption.getOrElse(-1)
      val bestDisallow = disallows.iterator.filter(matches(_, p)).map(_.length).maxOption.getOrElse(-1)
      bestAllow >= bestDisallow || bestDisallow < 0
    }
  }

  val allowAll: Rules = Rules(Vector.empty, Vector.empty)

  /** RFC 9309 §2.2.3 rule match: the pattern must match a prefix of `path`;
    * `*` matches any (possibly empty) character run and a trailing `$`
    * anchors the end. Greedy left-to-right segment scan directly over the
    * pattern string — indexOf only, zero allocation, no String.split and
    * no regex compilation in the per-url hot path.
    */
  private[engine] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pEnd = if (anchored) pattern.length - 1 else pattern.length
    val firstStar = {
      val i = pattern.indexOf('*')
      if (i < 0 || i >= pEnd) -1 else i
    }
    if (firstStar < 0) {
      // no wildcard: plain prefix (or exact when anchored)
      if (anchored)
        path.length == pEnd && path.regionMatches(0, pattern, 0, pEnd)
      else
        path.regionMatches(0, pattern, 0, pEnd)
    } else {
      if (!path.regionMatches(0, pattern, 0, firstStar)) return false
      var pos = firstStar // chars of path consumed so far
      var segStart = firstStar + 1
      while (true) {
        val nextStar = {
          val i = pattern.indexOf('*', segStart)
          if (i < 0 || i >= pEnd) -1 else i
        }
        val segEnd = if (nextStar < 0) pEnd else nextStar
        val segLen = segEnd - segStart
        if (nextStar < 0) {
          // last segment: anchored ⇒ must close the path; floating ⇒ must
          // merely occur after pos (RFC prefix semantics make the rest free)
          return if (anchored)
            path.length - segLen >= pos &&
              path.regionMatches(path.length - segLen, pattern, segStart, segLen)
          else segLen == 0 || indexOfSeg(path, pos, pattern, segStart, segLen) >= 0
        }
        if (segLen > 0) {
          val idx = indexOfSeg(path, pos, pattern, segStart, segLen)
          if (idx < 0) return false
          pos = idx + segLen
        }
        segStart = nextStar + 1
      }
      false // unreachable
    }
  }

  /** indexOf of pattern[segStart, segStart+segLen) in `path` from `from` —
    * a windowed scan so segments need no substring allocation.
    */
  private def indexOfSeg(path: String, from: Int, pattern: String,
                         segStart: Int, segLen: Int): Int = {
    var i = math.max(0, from)
    val last = path.length - segLen
    while (i <= last) {
      if (path.regionMatches(i, pattern, segStart, segLen)) return i
      i += 1
    }
    -1
  }

  private final case class Group(uas: Vector[String], allows: Vector[String],
                                 disallows: Vector[String], crawlDelayMs: Option[Long])

  /** Parse for the generic `*` group — the engine default: the crawl's UA
    * pool rotates per url (S6), so only generic rules apply globally.
    */
  def parse(body: String): Rules = parseFor(body, "*")

  /** Parse the rule group that applies to `productToken` (RFC 9309
    * §2.2.1): longest case-insensitive equal-or-prefix group token wins,
    * same-token groups merge, `*` groups are the fallback.
    */
  def parseFor(body: String, productToken: String): Rules = {
    val groups = parseGroups(body)
    val pt = productToken.toLowerCase
    val named =
      if (pt == "*") Vector.empty
      else groups.flatMap { g =>
        g.uas.collect { case ua if ua != "*" && pt.startsWith(ua.toLowerCase) => (ua.length, g) }
      }
    val winners =
      if (named.nonEmpty) {
        val best = named.map(_._1).max
        named.collect { case (len, g) if len == best => g }.distinct
      } else groups.filter(_.uas.contains("*"))
    if (winners.isEmpty) allowAll
    else {
      val delays = winners.flatMap(_.crawlDelayMs)
      Rules(
        winners.flatMap(_.allows).toVector,
        winners.flatMap(_.disallows).toVector,
        // most conservative wins if same-token groups disagree
        if (delays.isEmpty) None else Some(delays.max))
    }
  }

  private def parseGroups(body: String): Vector[Group] = {
    val out = Vector.newBuilder[Group]
    var uas = Vector.newBuilder[String]
    var allows = Vector.newBuilder[String]
    var disallows = Vector.newBuilder[String]
    var delay: Option[Long] = None
    var inHeader = false
    var open = false
    def flush(): Unit = {
      if (open) out += Group(uas.result(), allows.result(), disallows.result(), delay)
      uas = Vector.newBuilder[String]; allows = Vector.newBuilder[String]
      disallows = Vector.newBuilder[String]; delay = None; open = false
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (line.nonEmpty && idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" =>
            // consecutive User-agent lines share one group header
            if (!inHeader) { flush(); inHeader = true; open = true }
            uas += value
          case "allow" =>
            inHeader = false
            if (open && value.nonEmpty) allows += value
          case "disallow" =>
            inHeader = false
            if (open && value.nonEmpty) disallows += value
          case "crawl-delay" =>
            inHeader = false
            // unparsable values are IGNORED (they must not clobber a valid
            // delay declared earlier in the same group)
            if (open) value.toDoubleOption.foreach(d => delay = Some(math.max(0L, (d * 1000).toLong)))
          case "sitemap" =>
            // RFC 9309 "other record": complete no-op for grouping — in
            // particular a Sitemap line BETWEEN consecutive User-agent
            // lines must not split their shared header (clearing inHeader
            // here would flush token A into an empty group and hand the
            // following rules to token B alone)
            ()
          case _ =>
            inHeader = false
        }
      }
    }
    flush()
    out.result()
  }

  /** `Sitemap:` directives (the sitemaps.org cross-convention discovery
    * channel; RFC 9309 treats it as an "other record" outside groups — and
    * parseGroups honors that with an explicit no-op, so a directive BETWEEN
    * User-agent lines does not split their shared header). Values are
    * absolute urls per the protocol; order preserved — publishers list
    * their preferred sitemap first. The line discipline here (comment
    * strip, first-colon key split, trim) MUST mirror parseGroups' — the
    * two scans must never disagree on what a line says.
    */
  def sitemaps(body: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (idx > 0 && line.substring(0, idx).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(idx + 1).trim
        if (v.nonEmpty) out += v
      }
    }
    out.result()
  }

  def pathOf(url: String): String =
    try {
      val p = new java.net.URI(url).getPath
      if (p == null || p.isEmpty) "/" else p
    } catch { case _: Exception => "/" }
}

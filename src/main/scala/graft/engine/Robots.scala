package graft.engine

/** robots.txt gating — a north-rule addition with no reference analog
  * (BASELINE.json north_star; the reference crawls without robots checks).
  *
  * Rules are parsed from corpus rows whose url is `scheme://host/robots.txt`
  * (FIXTURES.md `robots` family). Longest-prefix-match wins between Allow
  * and Disallow (Google's documented semantics, simplified: no wildcards,
  * `$` ignored); empty Disallow value allows everything; only the
  * `User-agent: *` group applies.
  */
object Robots {

  final case class Rules(allows: Vector[String], disallows: Vector[String]) extends Serializable {
    def isAllowed(path: String): Boolean = {
      val p = if (path.isEmpty) "/" else path
      val bestAllow = allows.filter(p.startsWith).map(_.length).maxOption.getOrElse(-1)
      val bestDisallow = disallows.filter(p.startsWith).map(_.length).maxOption.getOrElse(-1)
      bestAllow >= bestDisallow || bestDisallow < 0
    }
  }

  val allowAll: Rules = Rules(Vector.empty, Vector.empty)

  /** Parse a robots.txt body: collect Allow/Disallow lines of every
    * `User-agent: *` group.
    */
  def parse(body: String): Rules = {
    // consecutive User-agent lines open a group header; the group's rules
    // apply iff one of those lines was `*`
    var inHeader = false
    var starActive = false
    val allows = Vector.newBuilder[String]
    val disallows = Vector.newBuilder[String]
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val idx = line.indexOf(':')
      if (line.nonEmpty && idx > 0) {
        val key = line.substring(0, idx).trim.toLowerCase
        val value = line.substring(idx + 1).trim
        key match {
          case "user-agent" =>
            if (!inHeader) { starActive = false; inHeader = true }
            if (value == "*") starActive = true
          case "allow" =>
            inHeader = false
            if (starActive && value.nonEmpty) allows += value
          case "disallow" =>
            inHeader = false
            if (starActive && value.nonEmpty) disallows += value
          case _ => ()
        }
      }
    }
    Rules(allows.result(), disallows.result())
  }

  def pathOf(url: String): String =
    try {
      val p = new java.net.URI(url).getPath
      if (p == null || p.isEmpty) "/" else p
    } catch { case _: Exception => "/" }
}

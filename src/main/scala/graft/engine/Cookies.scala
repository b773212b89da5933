package graft.engine

/** Cookie-header parsing parity with the reference's `lib/cookies.go`.
  *
  * `HttpCookies(rawCookies)` there delegates to Go's
  * `http.Request.Cookies()` — a Cookie *request header* parse: split on
  * ';', trim space, name before the first '=', double-quoted values
  * unquoted, nameless/empty parts dropped. `CookieAction`
  * (`lib/cookies.go:21-48`) then attaches each cookie to the browser with
  * `domain = hostname(link)` and expiry `now + 360*24h` when the job's
  * `expire` is 0 (hours otherwise).
  *
  * The fetch here is a corpus join, so cookies are fetch METADATA: the jar
  * is computed once per job (driver-side, deterministic — expiry carried in
  * hours, not a wall-clock timestamp) and rides the crawl output as a typed
  * struct column next to the raw string (S4).
  */
object Cookies {

  /** One parsed cookie as the reference's CookieAction would set it. */
  final case class Cookie(name: String, value: String, domain: String, expiresHours: Int)

  /** `360*24` — `lib/cookies.go:29-33`'s default when `expire == 0`. */
  val DefaultExpireHours: Int = 360 * 24

  private def validNameByte(c: Char): Boolean =
    c > 0x20 && c < 0x7f && !"()<>@,;:\\\"/[]?={} \t".contains(c)

  /** Go `http.Request.Cookies()` semantics (net/http readCookies). */
  def parse(rawCookies: String): Seq[(String, String)] = {
    if (rawCookies == null || rawCookies.trim.isEmpty) return Nil
    rawCookies.split(';').toSeq.flatMap { part0 =>
      val part = part0.trim
      if (part.isEmpty) None
      else {
        val eq = part.indexOf('=')
        val (name, rawVal) = if (eq < 0) (part, "") else (part.take(eq), part.drop(eq + 1))
        if (name.isEmpty || !name.forall(validNameByte)) None
        else {
          val v =
            if (rawVal.length >= 2 && rawVal.head == '"' && rawVal.last == '"')
              rawVal.substring(1, rawVal.length - 1)
            else rawVal
          Some((name, v))
        }
      }
    }
  }

  /** The job's cookie jar exactly as `CookieAction(link, raw, expire)`
    * would set it: per-cookie (name, value) from the header parse, domain =
    * hostname of the job link, expiry default 360×24 h.
    */
  def forJob(link: String, rawCookies: String, expire: Int): Seq[Cookie] = {
    val domain = graft.urls.Urls.host(link)
    val hours = if (expire == 0) DefaultExpireHours else expire
    parse(rawCookies).map { case (n, v) => Cookie(n, v, domain, hours) }
  }
}

package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IP-geolocation helper parity (S12, the last SURVEY.md §2.1 row): the
  * reference's `QueryIP(ip, lang)` (`lib/ip.go:11-41`) issues a per-ip HTTP
  * GET to a geolocation API and logs the parsed `Result`. The Spark-native
  * image of a per-row remote lookup is a BROADCAST JOIN against a GeoIP
  * reference table (the standard way to geolocate 10^10 crawl records —
  * per-row HTTP at that scale is neither polite nor possible), with the
  * same `Result` fields and the same call semantics: `lang` defaults to
  * "zh-CN", an empty ip returns false.
  */
object IpGeo {

  /** Field-for-field mirror of `lib/ip.go:44-59` Result. */
  final case class Result(
      query: String,
      status: String,
      country: String,
      countryCode: String,
      region: String,
      regionName: String,
      city: String,
      zip: String,
      lat: Double,
      lon: Double,
      timezone: String,
      isp: String,
      org: String,
      as_ : String // `as` is a Scala keyword; column name stays "as"
  )

  val columns: Seq[String] = Seq("query", "status", "country", "countryCode", "region",
    "regionName", "city", "zip", "lat", "lon", "timezone", "isp", "org", "as")

  /** `QueryIP(ip, lang)` call parity: looks one ip up in the geo table,
    * logs the result (the reference's observable behavior), returns whether
    * the lookup succeeded. `geo` must carry [[columns]] keyed by `query`.
    */
  def queryIp(geo: DataFrame, ip: String, lang: String = ""): Boolean = {
    val effectiveLang = if (lang == null || lang.isEmpty) "zh-CN" else lang
    if (ip == null || ip.isEmpty) return false // lib/ip.go:16-19
    val hit = geo.filter(col("query") === ip).limit(1).collect()
    if (hit.nonEmpty) {
      // the reference logs the JSON-ified Result (lib/ip.go:34-36)
      val row = hit.head
      val json = columns.map(c => s""""$c":"${row.get(row.fieldIndex(c))}"""").mkString("{", ",", s""","lang":"$effectiveLang"}""")
      org.slf4j.LoggerFactory.getLogger(getClass).info(json)
      true
    } else false
  }

  /** The scale path: enrich a crawl frame with geolocation by broadcast-
    * joining the (small) geo reference table on the ip column — one
    * map-side hash probe per row, no shuffle of the crawl side.
    */
  def enrich(df: DataFrame, ipCol: Column, geo: DataFrame): DataFrame = {
    val g = geo.select(col("query") +: columns.filterNot(_ == "query").map(c => col(c).as(s"geo_$c")): _*)
    df.join(broadcast(g), ipCol === g("query"), "left").drop("query")
  }
}

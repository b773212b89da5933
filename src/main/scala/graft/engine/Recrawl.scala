package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-crawl (freshness) scheduling — the uniform-refresh policy of Cho &
  * Garcia-Molina, "Synchronizing a Database to Improve Freshness" (SIGMOD
  * 2000): a url is DUE for re-crawl once its age since last crawl reaches
  * its estimated change period, and the refresh queue is ordered by
  * staleness = age / period.
  *
  * The reference crawler (JohnnyTing/rabida) has no persistence and so no
  * re-crawl notion; this is the component a CONTINUOUS crawl adds on top
  * of the engine's FrontierStore: feed `due` with the store's seen urls
  * joined to their pages' warc_ts, and its output (with `staleness_ppt`
  * as the priority, negated — higher staleness first) is exactly the
  * frontier shape `Crawler.crawlPrioritized` consumes.
  *
  * Scale shape: ONE narrow projection + filter over the history table —
  * map-only, no shuffle, codegen-friendly integer arithmetic. At 10^10
  * urls this is the cheapest full pass there is; the staleness is integer
  * fixed-point (parts-per-thousand) so ordering is deterministic,
  * recompute-stable, and oracle-expressible.
  */
object Recrawl {

  /** Urls due for re-crawl at `nowMs`. `history` carries one row per url:
    * (url, last_crawl_ms, change_period_ms); emits (url, age_ms,
    * change_period_ms, staleness_ppt) for rows with age >= period.
    */
  def due(history: DataFrame, nowMs: Long): DataFrame = {
    val age: Column = lit(nowMs) - col("last_crawl_ms")
    history
      .withColumn("age_ms", age)
      .filter(col("age_ms") >= col("change_period_ms"))
      // integer fixed-point staleness: 1000 = exactly one period overdue
      .withColumn("staleness_ppt",
        expr("(age_ms * 1000) div change_period_ms"))
      .select(col("url"), col("age_ms"), col("change_period_ms"), col("staleness_ppt"))
  }
}

package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pluggable fetch stage (SURVEY.md S1: "at real scale the join is
  * replaced by an HTTP fetcher behind the same politeness schedule").
  *
  * The crawler invokes `fetch` AFTER politeness scheduling — and, under
  * `realPace`, after the wall-clock pacing stage — so an implementation
  * sees each row only when the per-host schedule says its request may be
  * issued: `scheduled_ms` / `fetch_seq` / `emitted_ms` ride in on every
  * row. The contract:
  *
  *   - input: the paced frontier batch (`url`, `host`, `url_hash`,
  *     `seed_id`, `page_no`, `cursor`, priority/schedule columns);
  *   - output: the same rows with an `html` binary column appended;
  *   - rows the fetcher cannot retrieve are DROPPED (a miss ≙ the corpus
  *     join's 404/timeout lineage — the frontier store records
  *     `pages_missing` from the batch/fetched delta).
  *
  * When `Crawler.Config.fetcher` is None the crawler keeps its default
  * fused corpus scan-join (fetch BEFORE schedule, so urls absent from the
  * corpus never consume politeness slots — the plan shape pinned by
  * PlanSpec). [[CorpusJoinFetcher]] exposes that same join through this
  * trait for deployments that want the trait path end-to-end; a live
  * deployment supplies an HTTP implementation (e.g. a `mapPartitions`
  * connection-pool fetcher) without touching the loop.
  */
trait Fetcher extends Serializable {
  def fetch(pacedBatch: DataFrame): DataFrame
}

/** The sandbox/default fetch as a [[Fetcher]]: scan-join against a static
  * Common-Crawl-style corpus on url. `broadcastBatch` mirrors
  * `Crawler.Config.broadcastFrontier`: broadcast the (small) batch so the
  * corpus never shuffles; at 10^10-frontier scale switch it off for a
  * shuffle-hash join against a url-bucketed corpus.
  */
final class CorpusJoinFetcher(corpus: DataFrame, broadcastBatch: Boolean = true)
    extends Fetcher {
  private val pages = corpus.select(col("url"), col("html"))
  override def fetch(pacedBatch: DataFrame): DataFrame = {
    val b = if (broadcastBatch) broadcast(pacedBatch) else pacedBatch.hint("shuffle_hash")
    b.join(pages, Seq("url"), "inner")
  }
}

/** Deterministic fake fetcher for tests: synthesizes each page's bytes
  * from its url on the executors (no corpus, no I/O). `pageFor` must be a
  * pure function.
  */
final class SyntheticFetcher(pageFor: String => String) extends Fetcher {
  override def fetch(pacedBatch: DataFrame): DataFrame = {
    val render = udf { (u: String) =>
      val html = pageFor(u)
      if (html == null) null else html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    pacedBatch.withColumn("html", render(col("url"))).filter(col("html").isNotNull)
  }
}

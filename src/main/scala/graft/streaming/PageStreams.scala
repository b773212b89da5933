package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.{CrawlExtractExpression, Job}

/** Structured Streaming over the corpus table shape itself
  * (url, warc_ts, html, text, lang) — the continuous-ingest path of a
  * web-scale pipeline: each new parquet drop (a WARC batch landing in the
  * lake) flows through the SAME Catalyst extraction expression the batch
  * crawl uses, plus streaming URL-dedup, incrementally.
  *
  * Division of labor (SURVEY.md §2.5 streaming row): frontier EXPANSION is
  * a data-dependent fixpoint and stays in the batch loop (`Crawler.run`);
  * ingest-time EXTRACTION is append-only per page and is exactly what
  * Structured Streaming models. At 100 TB the stream partitions by file
  * (maxFilesPerTrigger bounds a micro-batch); extraction is map-local, and
  * the dedup state store is keyed by url — RocksDB-backed on a real
  * cluster, watermarked by `warc_ts` so state is bounded by the re-crawl
  * horizon, not the crawl's lifetime.
  */
object PageStreams {

  import org.apache.spark.sql.types._

  /** BASELINE.json input_hint schema, verbatim. */
  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType), StructField("warc_ts", TimestampType),
    StructField("html", BinaryType), StructField("text", StringType),
    StructField("lang", StringType)))

  /** File-source stream over a corpus parquet directory (glob ok). */
  def readPages(spark: SparkSession, path: String, maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(pageSchema)
    (if (maxFilesPerTrigger > 0) r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r)
      .parquet(path)
  }

  /** Streaming URL-seen: first sighting of each canonical url wins. State
    * is bounded by the watermark horizon (`warc_ts` + `horizon`): a page
    * re-fetched within the horizon dedups; past it, the url is eligible
    * again — the re-crawl semantics a continuously-ingesting crawler wants.
    */
  def firstSightings(pages: DataFrame, horizon: String = "1 hour"): DataFrame = {
    val canon = udf((u: String) => graft.urls.Urls.canonicalize(u))
    pages
      .withColumn("canonical_url", canon(col("url")))
      .withWatermark("warc_ts", horizon)
      .dropDuplicatesWithinWatermark("canonical_url")
  }

  /** Ingest-time extraction: the batch crawl's `CrawlExtractExpression`
    * applied per arriving page (page_no/cursor fixed — pagination is the
    * batch loop's job), exploded to one row per extracted item. Purely
    * map-local: streams through any sink with no state.
    */
  def extractedItems(pages: DataFrame, job: Job): DataFrame = {
    val x = CrawlExtractExpression(col("html"), col("url"), lit(1), lit(0), job,
      graft.extract.JsProperty, scroll = false)
    pages
      .select(col("url"), col("warc_ts"), col("lang"), x.as("x"))
      .select(col("url"), col("warc_ts"), col("lang"),
        col("x.next_page_url").as("next_page_url"),
        col("x.error").as("error"),
        posexplode_outer(col("x.items")).as(Seq("pos", "item")))
  }
}

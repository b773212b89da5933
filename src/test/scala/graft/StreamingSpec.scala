package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the streaming file source requires a directory — stage the events
  // parquet into one
  lazy val path: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  test("streaming windowed rollup equals the batch window query") {
    val stream = EventStreams.readEvents(spark, path)
    val norm = Seq("CAST(win_start AS STRING) AS w", "event_type", "n", "total_cents")
    val out = EventStreams.runToMemory(spark,
      EventStreams.windowedRollup(stream), "rollup")
      .selectExpr(norm: _*).collect().map(_.toString).sorted
    val batch = PipelineQueries.qEventsWindow(spark, "/root/testdata/sf0.001")
      .selectExpr(norm: _*).collect().map(_.toString).sorted
    assert(out.nonEmpty)
    assert(out.toSeq == batch.toSeq)
  }

  // corpus pages staged as a parquet directory (continuous-ingest shape:
  // each file is "one WARC batch landing")
  lazy val pagesPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pages").toString
    graft.corpus.Fixtures.corpus(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming page extraction equals batch extraction (same expression)") {
    import graft.streaming.PageStreams
    val job = CrawlQueries.listJob
    val stream = PageStreams.readPages(spark, pagesPath, maxFilesPerTrigger = 2)
    val out = EventStreams.runToMemory(spark,
      PageStreams.extractedItems(stream, job), "pageextract",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .filter(col("item").isNotNull)
      .selectExpr("url", "pos", "item.title", "item.link", "item.date_s")
      .collect().map(_.toString).sorted
    val batch = PageStreams.extractedItems(spark.read.parquet(pagesPath), job)
      .filter(col("item").isNotNull)
      .selectExpr("url", "pos", "item.title", "item.link", "item.date_s")
      .collect().map(_.toString).sorted
    assert(out.nonEmpty)
    assert(out.toSeq == batch.toSeq)
  }

  test("streaming url-seen keeps the first sighting per canonical url") {
    import graft.streaming.PageStreams
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dups").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    // same canonical url fetched twice within the horizon (the fragment
    // difference exercises canonicalization), plus a distinct url
    Seq(
      ("http://h0.test/a", t0, "<p>first</p>".getBytes("UTF-8"), "first", "en"),
      ("http://h0.test/a#frag", t1, "<p>again</p>".getBytes("UTF-8"), "again", "en"),
      ("http://h0.test/b", t0, "<p>other</p>".getBytes("UTF-8"), "other", "en"))
      .toDF("url", "warc_ts", "html", "text", "lang")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val out = EventStreams.runToMemory(spark,
      PageStreams.firstSightings(PageStreams.readPages(spark, dir), horizon = "1 hour"),
      "firstsight", org.apache.spark.sql.streaming.OutputMode.Append())
      .select("canonical_url").as[String].collect().sorted
    assert(out.length == 2)
    assert(out.forall(u => u.endsWith("/a") || u.endsWith("/b")))
  }

  test("mapGroupsWithState user totals equal batch groupBy") {
    import spark.implicits._
    val stream = EventStreams.readEvents(spark, path)
    val out = EventStreams.runToMemory(spark,
      EventStreams.userTotals(spark, stream).toDF(),
      "usertotals", org.apache.spark.sql.streaming.OutputMode.Update())
      // Update mode emits one row per key per batch; single batch here
      .groupBy("user_id").agg(max("n_events").as("n_events"), max("total_cents").as("total_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = spark.read.parquet(path)
      .groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == batch.toSeq)
  }
}

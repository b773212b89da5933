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

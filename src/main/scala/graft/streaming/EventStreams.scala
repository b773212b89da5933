package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The crawl loop itself is deliberately NOT streaming (data-dependent
  * fixpoint, SURVEY.md §2.5) — these cover the streaming surface a
  * training-data pipeline needs around it: event-time windowed rollups
  * with watermarks (late-data bound) and custom sessionization state via
  * `mapGroupsWithState`. Both are proven against their batch equivalents
  * in StreamingSpec (same inputs → same rows).
  */
object EventStreams {

  import org.apache.spark.sql.types._

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over a parquet path (glob ok). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(path)

  /** Event-time tumbling rollup with a 10-minute watermark: the streaming
    * twin of PipelineQueries.qEventsWindow.
    */
  def windowedRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("total_cents"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("total_cents"))

  final case class UserAgg(user_id: Long, n_events: Long, total_cents: Long)

  /** Custom per-key state via mapGroupsWithState: running per-user totals
    * (the KeyValueGroupedDataset state surface; ProcessingTimeTimeout
    * unused at test scale but wired as production would).
    */
  def userTotals(spark: SparkSession, events: DataFrame): Dataset[UserAgg] = {
    import spark.implicits._
    events.selectExpr("user_id", "CAST(round(value*100) AS LONG) AS cents")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0L))
          var n = prev.n_events
          var tot = prev.total_cents
          rows.foreach { case (_, c) => n += 1; tot += c }
          val next = UserAgg(uid, n, tot)
          state.update(next)
          next
      }
  }

  /** Run a streaming query to a memory sink synchronously (test helper):
    * processes everything available, materializes the result, and DROPS
    * the sink's temp view — repeated runs in one session leave no
    * accumulated tables, and deterministic sink names are reuse-safe.
    * Memory-sink temp views are SESSION-scoped, so concurrent processes
    * never collide; within one session the deterministic `name` assumes
    * one runToMemory at a time per name (all call sites are sequential
    * verify/bench/test drivers).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
                  mode: OutputMode = OutputMode.Complete()): DataFrame = {
    spark.catalog.dropTempView(name) // stale sink from an aborted prior run
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table(name).localCheckpoint(true) // eager copy out of the sink
    spark.catalog.dropTempView(name)
    out
  }

  /** Deterministic staging dir for corpus → file-stream twins: repeated
    * verify/bench runs WITHIN one process overwrite one directory per
    * (tag, source) instead of accumulating fresh createTempDirectory
    * copies in /tmp, while the PID component keeps two concurrent
    * processes on the same machine from overwriting each other's staged
    * parquet mid-stream.
    */
  def stagingDir(tag: String, sfDir: String): String =
    java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-stage-p${ProcessHandle.current().pid()}-$tag-" +
        sfDir.replaceAll("[^A-Za-z0-9.]", "_")).toString
}

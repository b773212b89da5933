package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Iceberg-style snapshot layer for the crawl frontier + URL-seen state —
  * hand-rolled because the sandbox ships no Iceberg jar (SURVEY.md §4):
  * immutable parquet data dirs + an atomically-renamed JSON manifest per
  * snapshot, checkpoint/resume by reopening the latest manifest, and
  * per-partition lineage metrics embedded in each manifest (north_star:
  * "snapshot-based checkpoint/resume and per-partition lineage metrics").
  *
  * Commit protocol (single-writer, crash-safe):
  *   1. write `data/round=N/frontier` + `data/round=N/seen` parquet,
  *   2. write `manifest-N.json.tmp` with the file list + metrics,
  *   3. ATOMIC_MOVE to `manifest-N.json`, then to `latest.json`.
  * A reader never observes a half-written snapshot; re-running round N is
  * idempotent (the URL-seen anti-join absorbs replays, SURVEY.md §7 #4).
  */
final class FrontierStore(val dir: String)(implicit spark: SparkSession) {

  Files.createDirectories(Paths.get(dir))

  final case class Snapshot(round: Int, frontier: DataFrame, seen: DataFrame)

  def commit(round: Int, frontier: DataFrame, seen: DataFrame, metrics: Seq[(String, Long)],
             partitionMetrics: Seq[(Int, Long)] = Nil): Unit = {
    val base = s"$dir/data/round=$round"
    // north-star frontier layout: partitioned by host_bucket, rows sorted
    // by priority within each file → a batch read prunes to eligible
    // buckets and gets priority order from file order (min/max stats)
    if (frontier.columns.contains("host_bucket")) {
      frontier
        .repartition(org.apache.spark.sql.functions.col("host_bucket"))
        .sortWithinPartitions("priority")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("host_bucket")
        .parquet(s"$base/frontier")
    } else {
      frontier.write.mode(SaveMode.Overwrite).parquet(s"$base/frontier")
    }
    seen.write.mode(SaveMode.Overwrite).parquet(s"$base/seen")
    // schemas ride the snapshot so a COMPLETED crawl's empty frontier (zero
    // parquet row groups → no inferable schema) still resumes cleanly
    Files.write(Paths.get(s"$base/frontier.schema.json"),
      frontier.schema.json.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(s"$base/seen.schema.json"),
      seen.schema.json.getBytes(StandardCharsets.UTF_8))
    val filesList = listParquet(s"$base/frontier") ++ listParquet(s"$base/seen")
    val json = manifestJson(round, filesList, metrics, partitionMetrics)
    val tmp = Paths.get(s"$dir/manifest-$round.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(s"$dir/manifest-$round.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val tmp2 = Paths.get(s"$dir/latest.json.tmp")
    Files.write(tmp2, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp2, Paths.get(s"$dir/latest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def loadLatest(): Option[Snapshot] = {
    val latest = Paths.get(s"$dir/latest.json")
    if (!Files.exists(latest)) None
    else {
      val json = new String(Files.readAllBytes(latest), StandardCharsets.UTF_8)
      val round = """"round"\s*:\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
      round.map { r =>
        def readWithSchema(part: String) = {
          val sp = Paths.get(s"$dir/data/round=$r/$part.schema.json")
          val reader =
            if (Files.exists(sp))
              spark.read.schema(org.apache.spark.sql.types.DataType
                .fromJson(new String(Files.readAllBytes(sp), StandardCharsets.UTF_8))
                .asInstanceOf[org.apache.spark.sql.types.StructType])
            else spark.read
          reader.parquet(s"$dir/data/round=$r/$part")
        }
        Snapshot(r, readWithSchema("frontier"), readWithSchema("seen"))
      }
    }
  }

  def manifestRounds(): Seq[Int] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .flatMap(f => """manifest-(\d+)\.json$""".r.findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .sorted.toSeq
  }

  private def listParquet(path: String): Seq[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path))
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
  }

  private def manifestJson(round: Int, files: Seq[String], metrics: Seq[(String, Long)],
                           partitionMetrics: Seq[(Int, Long)]): String = {
    val fs = files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
    val ms = metrics.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val pm = partitionMetrics.map { case (p, n) => s"""{"partition":$p,"rows":$n}""" }.mkString("[", ",", "]")
    s"""{"format":"graft-frontier-v1","round":$round,"committed_at":${System.currentTimeMillis()},"files":$fs,"metrics":$ms,"partition_lineage":$pm}"""
  }
}

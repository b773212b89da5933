package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import java.nio.charset.StandardCharsets

/** Iceberg-style snapshot layer for the crawl frontier + URL-seen state —
  * hand-rolled because the sandbox ships no Iceberg jar (SURVEY.md §4):
  * immutable parquet data dirs + an atomically-renamed JSON manifest per
  * snapshot, checkpoint/resume by reopening the latest manifest, and
  * per-partition lineage metrics embedded in each manifest (north_star:
  * "snapshot-based checkpoint/resume and per-partition lineage metrics").
  *
  * All metadata I/O goes through the Hadoop `FileSystem`/`FileContext`
  * API resolved from the store URI, NOT java.nio — the 10^10-frontier
  * regime checkpoints to HDFS/S3-style object stores, never a local disk.
  * `dir` may therefore be any Hadoop-resolvable URI (`file:/...`,
  * `hdfs://...`, `s3a://...`); a bare local path resolves through the
  * session's default FS.
  *
  * Commit protocol (single-writer, crash-safe):
  *   1. write `data/round=N/frontier` + `data/round=N/seen-delta` parquet
  *      (the delta holds ONLY the round's newly-seen rows — commit I/O is
  *      O(batch) per round; the manifest's `seen_deltas` list is the
  *      Iceberg-style union a reader reconstructs the full seen set from),
  *   2. write `manifest-N.json.tmp` with the file list + delta list +
  *      metrics,
  *   3. atomic overwrite-rename to `manifest-N.json`, then to `latest.json`
  *      (FileContext.rename with Options.Rename.OVERWRITE — the rename
  *      HDFS guarantees atomic; on S3A the manifest is a single small
  *      object so the copy+delete is still last-writer-wins consistent).
  * A reader never observes a half-written snapshot; re-running round N is
  * idempotent (the URL-seen anti-join absorbs replays, and a replayed
  * round overwrites its own delta dir without double-listing it;
  * SURVEY.md §7 #4). Legacy v1 manifests (full `seen` table per round)
  * still load.
  */
final class FrontierStore(val dir: String, val compactEvery: Int = 64)(
    implicit spark: SparkSession) {

  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private val root = new Path(dir)
  private val fs: FileSystem = root.getFileSystem(hadoopConf)
  private val fc: FileContext =
    FileContext.getFileContext(fs.getUri, hadoopConf)
  fs.mkdirs(root)
  /** Root qualified against the store's FS so relative local paths and
    * scheme-less URIs land on the same FS the writers use. */
  private val qroot: Path = fs.makeQualified(root)

  private def writeBytes(p: Path, bytes: Array[Byte]): Unit = {
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  private def readBytes(p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  private def atomicOverwriteRename(src: Path, dst: Path): Unit =
    fc.rename(src, dst, Options.Rename.OVERWRITE)

  final case class Snapshot(round: Int, frontier: DataFrame, seen: DataFrame)

  /** Directories of the seen deltas committed so far (oldest first), i.e.
    * the manifest's `seen_deltas` list. Initialized from `latest.json` on
    * first use so a store that resumes an existing crawl keeps appending
    * to the loaded chain. Mutated only by `commit`, which runs on the
    * crawler's single-threaded ordered commit pool.
    */
  private var deltaDirs: Option[Seq[String]] = None

  private def currentDeltaDirs(): Seq[String] = deltaDirs.getOrElse {
    val latest = new Path(qroot, "latest.json")
    val dirs =
      if (!fs.exists(latest)) Seq.empty[String]
      else {
        val json = new String(readBytes(latest), StandardCharsets.UTF_8)
        parseSeenDeltas(json).getOrElse(legacySeenDir(json).toSeq)
      }
    deltaDirs = Some(dirs)
    dirs
  }

  /** Legacy v1 (full-seen) manifest: the round's `data/round=N/seen` table
    * IS the chain's base — it must seed `deltaDirs`, or the first post-
    * upgrade commit would list only its own delta and every pre-upgrade
    * url would resurface as unseen after the next resume.
    */
  private def legacySeenDir(json: String): Option[String] =
    """"round"\s*:\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
      .map(r => new Path(qroot, s"data/round=$r/seen"))
      .filter(fs.exists)
      .map(_.toString)

  /** Commit round N. `seenDelta` is ONLY the round's newly-seen rows: the
    * store appends it as an immutable per-round delta dir and the manifest
    * carries the full delta list, so commit I/O is O(batch) per round —
    * never O(|seen|) (the old full-seen rewrite was the loop's last
    * per-round O(|seen|) term at 10^10 urls). `loadLatest` unions the
    * manifest-listed deltas (one multi-path parquet read).
    */
  def commit(round: Int, frontier: DataFrame, seenDelta: DataFrame, metrics: Seq[(String, Long)],
             partitionMetrics: Seq[(Int, Long)] = Nil): Unit = {
    val base = new Path(qroot, s"data/round=$round")
    // north-star frontier layout: partitioned by host_bucket, rows sorted
    // by priority within each file → a batch read prunes to eligible
    // buckets and gets priority order from file order (min/max stats)
    if (frontier.columns.contains("host_bucket")) {
      frontier
        .repartition(org.apache.spark.sql.functions.col("host_bucket"))
        .sortWithinPartitions("priority")
        .write.mode(SaveMode.Overwrite)
        .partitionBy("host_bucket")
        .parquet(new Path(base, "frontier").toString)
    } else {
      frontier.write.mode(SaveMode.Overwrite).parquet(new Path(base, "frontier").toString)
    }
    val deltaDir = new Path(base, "seen-delta")
    seenDelta.write.mode(SaveMode.Overwrite).parquet(deltaDir.toString)
    // schemas ride the snapshot so a COMPLETED crawl's empty frontier (zero
    // parquet row groups → no inferable schema) still resumes cleanly
    writeBytes(new Path(base, "frontier.schema.json"),
      frontier.schema.json.getBytes(StandardCharsets.UTF_8))
    writeBytes(new Path(base, "seen.schema.json"),
      seenDelta.schema.json.getBytes(StandardCharsets.UTF_8))
    // a re-committed round (crash replay) must not list its delta twice
    val chain = currentDeltaDirs().filterNot(_ == deltaDir.toString) :+ deltaDir.toString
    // LSM-style compaction: the delta chain would otherwise grow
    // O(rounds) — a 10^4-round crawl's resume would union 10^4 parquet
    // dirs and every FS listing walks them all. When the chain exceeds
    // `compactEvery`, fold it into ONE base dir under this round
    // (amortized O(|seen|/compactEvery) write per round — the standard
    // LSM tradeoff against the old every-round O(|seen|) rewrite; the
    // manifest swap stays atomic).
    val compacted = compactEvery > 0 && chain.size > compactEvery
    val newDeltas =
      if (compacted) {
        val compactDir = new Path(base, "seen-compact")
        spark.read.schema(seenDelta.schema).parquet(chain: _*)
          .write.mode(SaveMode.Overwrite).parquet(compactDir.toString)
        Seq(compactDir.toString)
      } else chain
    // on a compaction round the manifest's file list cites the compacted
    // base (the delta dir it folded in is about to be GC'd)
    val filesList = listParquet(new Path(base, "frontier")) ++
      (if (compacted) listParquet(new Path(newDeltas.head)) else listParquet(deltaDir))
    val json = manifestJson(round, filesList, newDeltas, metrics, partitionMetrics)
    val tmp = new Path(qroot, s"manifest-$round.json.tmp")
    writeBytes(tmp, json.getBytes(StandardCharsets.UTF_8))
    atomicOverwriteRename(tmp, new Path(qroot, s"manifest-$round.json"))
    val tmp2 = new Path(qroot, "latest.json.tmp")
    writeBytes(tmp2, json.getBytes(StandardCharsets.UTF_8))
    atomicOverwriteRename(tmp2, new Path(qroot, "latest.json"))
    // only after the manifest rename (the commit point) does the chain advance
    deltaDirs = Some(newDeltas)
    // GC the superseded chain AFTER the commit point: without it every
    // compaction leaks the ~compactEvery folded delta dirs plus the
    // previous compacted base — ~rounds/compactEvery full copies of the
    // seen table at the 10^10-url design point. The store is single-
    // writer and readers open `latest.json`, so once the rename lands no
    // NEW reader can reach the superseded dirs; a crash between rename
    // and GC only leaks (the next compaction does not re-list them, and
    // leaked dirs are never referenced). Deletion is best-effort and
    // confined to this store's data/ tree.
    if (compacted) {
      val dataRoot = new Path(qroot, "data").toString
      chain.foreach { d =>
        if (d.startsWith(dataRoot))
          try fs.delete(new Path(d), true) catch { case _: java.io.IOException => () }
      }
    }
  }

  /** Snapshot round N's extracted pages (Config.persistPages). Written
    * BEFORE the round's manifest rename, so a committed manifest implies
    * its pages dir is complete; a crash between the two leaves an
    * unreferenced dir that the round's replay overwrites.
    */
  def commitPages(round: Int, pages: DataFrame): Unit = {
    val dir = new Path(qroot, s"data/round=$round/pages")
    pages.write.mode(SaveMode.Overwrite).parquet(dir.toString)
    writeBytes(new Path(qroot, s"data/round=$round/pages.schema.json"),
      pages.schema.json.getBytes(StandardCharsets.UTF_8))
  }

  /** Union of all committed pages snapshots for rounds <= upToRound
    * (one multi-path parquet read); None when no round persisted pages.
    */
  def loadPages(upToRound: Int): Option[DataFrame] = {
    val rounds = manifestRounds().filter(_ <= upToRound)
    val dirs = rounds.map(r => new Path(qroot, s"data/round=$r/pages"))
      .filter(fs.exists).map(_.toString)
    if (dirs.isEmpty) None
    else {
      val sp = rounds.reverseIterator
        .map(r => new Path(qroot, s"data/round=$r/pages.schema.json"))
        .find(fs.exists)
      val reader = sp match {
        case Some(p) => spark.read.schema(org.apache.spark.sql.types.DataType
          .fromJson(new String(readBytes(p), StandardCharsets.UTF_8))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
        case None => spark.read
      }
      Some(reader.parquet(dirs: _*))
    }
  }

  def loadLatest(): Option[Snapshot] = {
    val latest = new Path(qroot, "latest.json")
    if (!fs.exists(latest)) None
    else {
      val json = new String(readBytes(latest), StandardCharsets.UTF_8)
      val round = """"round"\s*:\s*(\d+)""".r.findFirstMatchIn(json).map(_.group(1).toInt)
      round.map { r =>
        def schemaReader(part: String) = {
          val sp = new Path(qroot, s"data/round=$r/$part.schema.json")
          if (fs.exists(sp))
            spark.read.schema(org.apache.spark.sql.types.DataType
              .fromJson(new String(readBytes(sp), StandardCharsets.UTF_8))
              .asInstanceOf[org.apache.spark.sql.types.StructType])
          else spark.read
        }
        val frontier = schemaReader("frontier")
          .parquet(new Path(qroot, s"data/round=$r/frontier").toString)
        val seen = parseSeenDeltas(json) match {
          case Some(dirs) =>
            // delta layout: ONE multi-path parquet read unions the chain
            // (file-source listing parallelizes; no per-delta plan nodes)
            deltaDirs = Some(dirs)
            schemaReader("seen").parquet(dirs: _*)
          case None =>
            // legacy (pre-delta) snapshot layout: one full seen table. It
            // also SEEDS the delta chain, so post-upgrade commits carry
            // the pre-upgrade seen set forward (first link of the chain).
            val legacy = new Path(qroot, s"data/round=$r/seen").toString
            deltaDirs = Some(Seq(legacy))
            schemaReader("seen").parquet(legacy)
        }
        Snapshot(r, frontier, seen)
      }
    }
  }

  def manifestRounds(): Seq[Int] = {
    if (!fs.exists(qroot)) Seq.empty
    else fs.listStatus(qroot).toSeq
      .flatMap(st => """manifest-(\d+)\.json$""".r.findFirstMatchIn(st.getPath.getName).map(_.group(1).toInt))
      .sorted
  }

  private def listParquet(path: Path): Seq[String] = {
    if (!fs.exists(path)) Seq.empty
    else {
      val it = fs.listFiles(path, true)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) out += st.getPath.toString
      }
      out.sorted.toSeq
    }
  }

  private def jsonStr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def manifestJson(round: Int, files: Seq[String], seenDeltas: Seq[String],
                           metrics: Seq[(String, Long)],
                           partitionMetrics: Seq[(Int, Long)]): String = {
    val fs = files.map(jsonStr).mkString("[", ",", "]")
    val sd = seenDeltas.map(jsonStr).mkString("[", ",", "]")
    val ms = metrics.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val pm = partitionMetrics.map { case (p, n) => s"""{"partition":$p,"rows":$n}""" }.mkString("[", ",", "]")
    s"""{"format":"graft-frontier-v2","round":$round,"committed_at":${System.currentTimeMillis()},"files":$fs,"seen_deltas":$sd,"metrics":$ms,"partition_lineage":$pm}"""
  }

  /** `seen_deltas` array from a manifest; None on a legacy (v1, full-seen)
    * manifest so the reader falls back to `data/round=N/seen`.
    */
  private def parseSeenDeltas(json: String): Option[Seq[String]] =
    """"seen_deltas"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(json).map { m =>
      """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(m.group(1))
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
}

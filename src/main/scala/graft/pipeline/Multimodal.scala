package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * payloads with typed metadata, processed batch-at-a-time.
  *
  * The decode step parses REAL container headers where the payload has
  * them — PNG / JPEG / GIF / WAV dimensions and audio shape via
  * [[MediaHeaders]] (pure-JVM byte arithmetic; no media library exists in
  * this container, and none is needed for header fields). Pixel/sample
  * DECODING (inflating IDAT, IDCT, PCM processing) would need a codec and
  * remains out of scope — payloads with no recognized magic fall back to
  * [[StubDecoder]]'s deterministic fake, preserving the pipeline shape
  * for arbitrary bytes. Everything around the decode — the binary
  * column, the typed batch schema, `mapPartitions` batch shape (the Scala
  * analogue of `mapInPandas`: one iterator per partition, library handles
  * amortized per-batch, not per-row), partition sizing — is real and
  * tested.
  */
object Multimodal {

  /** Typed row for decoded media metadata. */
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      fmt: String,
      width: Long,
      height: Long,
      frames: Long
  )

  /** The fallback codec for payloads with no recognized container magic:
    * deterministic pure function of the payload length. Keeps the
    * pipeline total over arbitrary bytes (a real pipeline would emit an
    * `undecodable` lineage column instead).
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (String, Long, Long, Long) = {
      val n = payload.length.toLong
      val fmt = (n % 3) match {
        case 0 => "img"
        case 1 => "audio"
        case _ => "video"
      }
      (fmt, 320 + n % 320, 240 + n % 240, n % 24 + 1)
    }
  }

  /** Header-first decode: real container headers when present
    * ([[MediaHeaders]]), stub fallback otherwise.
    */
  def decodePayload(payload: Array[Byte]): (String, Long, Long, Long) =
    MediaHeaders.parse(payload) match {
      case Some(m) => (m.fmt, m.width, m.height, m.frames)
      case None    => StubDecoder.decode(payload)
    }

  /** Attach a binary payload column (here: the utf-8 text bytes — the
    * corpus has no real media; the pipeline shape is the point).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Batch decode via mapPartitions over a typed Dataset — the
    * mapInPandas-shaped stage: per-partition iterator in, iterator out,
    * decoder state initialized once per partition (not per row).
    */
  def decodeMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    val src = withPayload(docs).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    src.mapPartitions { it =>
      // per-partition decoder init would go here (e.g. native codec handle)
      it.map { case (id, payload) =>
        val (fmt, w, h, fr) = decodePayload(payload)
        MediaMeta(id, payload.length.toLong, fmt, w, h, fr)
      }
    }
  }

  /** Real-container metadata over deterministically synthesized payloads:
    * each doc gets an actual PNG / JPEG / GIF / WAV byte stream
    * ([[MediaHeaders.buildPayload]], shape derived from doc_id), and the
    * header PARSER — not a formula — recovers the shape. The DuckDB
    * oracle recomputes the expected shape from doc_id, so a parser that
    * misreads an offset or endianness fails the hash check.
    */
  def mediaMetaReal(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val src = docs.select(col("doc_id")).as[Long]
    src.mapPartitions { it =>
      it.map { id =>
        val payload = MediaHeaders.buildPayload(id)
        val (fmt, w, h, fr) = decodePayload(payload)
        MediaMeta(id, payload.length.toLong, fmt, w, h, fr)
      }
    }.toDF()
      .select("doc_id", "n_bytes", "fmt", "width", "height", "frames")
      .orderBy("doc_id")
  }

  /** Real MP4 video metadata: each doc becomes an actual ISO-BMFF byte
    * stream ([[MediaHeaders.buildMp4]], shape + frame count + duration
    * derived from doc_id) and the box-walk PARSER recovers dims from
    * `tkhd` (16.16 fixed-point), frame count from `stbl/stsz` and
    * duration from `mvhd` ticks/timescale. The DuckDB oracle recomputes
    * all four from doc_id, so a wrong box offset, a missed version
    * branch, or fixed-point mis-shift breaks the hash.
    */
  def mediaMetaVideo(spark: SparkSession, docs: DataFrame): DataFrame =
    mediaMetaVideoUnsorted(spark, docs).orderBy("doc_id")

  /** The parse WITHOUT mediaMetaVideo's query-surface ordering: the frame
    * sampler explodes (destroying row order) and applies its own final
    * sort — feeding it the sorted variant would pay a full range-partition
    * exchange for nothing (Catalyst does not eliminate a Sort below a
    * Generate).
    */
  private def mediaMetaVideoUnsorted(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val src = docs.select(col("doc_id")).as[Long]
    src.mapPartitions { it =>
      it.map { id =>
        val payload = MediaHeaders.buildMp4(id)
        val m = MediaHeaders.parseMp4Detail(payload).getOrElse(
          throw new IllegalStateException(s"buildMp4($id) produced an unparseable container"))
        (id, payload.length.toLong, "mp4", m.width, m.height, m.frames, m.durationMs)
      }
    }.toDF("doc_id", "n_bytes", "fmt", "width", "height", "frames", "duration_ms")
  }

  /** Frame sampling driven by REAL parsed video metadata (not the stub
    * byte-length formula): every `everyNth`-th frame index of each MP4's
    * stsz sample count. Same explode fan-out shape as [[sampleFrames]] —
    * at scale, repartition before the per-frame decode so one long video
    * cannot skew a partition.
    */
  def sampleFramesVideo(spark: SparkSession, docs: DataFrame, everyNth: Long = 7): DataFrame =
    mediaMetaVideoUnsorted(spark, docs)
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("frames") - 1, lit(everyNth))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** The oracle-checkable projection of the metadata (everything derivable
    * from byte length — DuckDB mirrors with octet_length(encode(text))).
    */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    mediaMetaUnsorted(spark, docs).orderBy("doc_id")

  /** ONE owner of the oracle projection, without the query-surface sort —
    * the frame sampler builds here (same pattern as
    * [[mediaMetaVideoUnsorted]]).
    */
  private def mediaMetaUnsorted(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs).toDF()
      .select("doc_id", "n_bytes", "fmt", "width", "height", "frames")

  /** Frame-sampling plumbing: explode a deterministic frame index range per
    * video row (stub for per-frame feature extraction; shows the fan-out
    * shape — at scale this is the step that needs `repartition` before the
    * heavy decode so one large video cannot skew a partition).
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyNth: Long = 7): DataFrame = {
    // unsorted meta core: the explode destroys row order and the final
    // orderBy below re-sorts, so mediaMeta's surface sort would be a
    // wasted full exchange (same reasoning as sampleFramesVideo)
    mediaMetaUnsorted(spark, docs).filter(col("fmt") === "video")
      .select(col("doc_id"), explode(sequence(lit(0L), col("frames") - 1, lit(everyNth))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }
}

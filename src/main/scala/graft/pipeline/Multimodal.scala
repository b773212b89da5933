package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video as opaque `binary`
  * payloads with typed metadata, processed batch-at-a-time.
  *
  * The decode step is STUBBED (no image/audio libraries in this container):
  * [[StubDecoder]] derives deterministic fake media properties from the
  * payload bytes. Everything around it — the binary column, the typed
  * batch schema, `mapPartitions` batch shape (the Scala analogue of
  * `mapInPandas`: one iterator per partition, library handles amortized
  * per-batch, not per-row), partition sizing — is real and tested, so
  * swapping a real codec in changes one function.
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

  /** The stub codec: deterministic pure function of the payload.
    * A real implementation would parse magic bytes + headers here.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (String, Long, Long, Long) = {
      val n = payload.length.toLong
      val fmt = (n % 3) match {
        case 0 => "img"
        case 1 => "audio"
        case _ => "video"
      }
      // fake dimensions/frames derived from the byte length — stands in for
      // header parsing; replace with a real codec to productionize
      (fmt, 320 + n % 320, 240 + n % 240, n % 24 + 1)
    }
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
        val (fmt, w, h, fr) = StubDecoder.decode(payload)
        MediaMeta(id, payload.length.toLong, fmt, w, h, fr)
      }
    }
  }

  /** The oracle-checkable projection of the metadata (everything derivable
    * from byte length — DuckDB mirrors with octet_length(encode(text))).
    */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMeta(spark, docs).toDF()
      .select("doc_id", "n_bytes", "fmt", "width", "height", "frames")
      .orderBy("doc_id")

  /** Frame-sampling plumbing: explode a deterministic frame index range per
    * video row (stub for per-frame feature extraction; shows the fan-out
    * shape — at scale this is the step that needs `repartition` before the
    * heavy decode so one large video cannot skew a partition).
    */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyNth: Long = 7): DataFrame = {
    val meta = mediaMeta(spark, docs)
    meta.filter(col("fmt") === "video")
      .select(col("doc_id"), explode(sequence(lit(0L), col("frames") - 1, lit(everyNth))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  }
}

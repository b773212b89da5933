package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostic: stage timings + cardinalities for the MinHash path. */
object MinhashDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.mkSession("32")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val sh = graft.pipeline.Dedup.shingles(docs).cache()
    t("shingles count")(println("  n=" + sh.count()))
    val sig = graft.pipeline.Dedup.minhashSignatures(docs).cache()
    t("signatures")(println("  n=" + sig.count()))
    val rng = 0 // bands inline below (mirror of minhashLshPairs)
    val bands = 32; val rows = 4
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*).as("sig"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig")).cache()
    t("buckets")(println("  n=" + buckets.count()))
    val cand = buckets.alias("x").join(buckets.alias("y"), Seq("band", "sig"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id")).distinct().cache()
    t("candidates")(println("  n=" + cand.count()))
    val _ = rng
    spark.stop()
  }
}

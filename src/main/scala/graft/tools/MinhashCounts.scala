package graft.tools

import org.apache.spark.sql.functions._

/** Measurement probe for the LSH candidate funnel at a given sf (guide
  * §1): bucket-size distribution, raw intra-bucket pair volume, distinct
  * pairs, est-prescreen survivors. Decides where the prescreen must sit.
  */
object MinhashCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val mh = graft.pipeline.Dedup.minhashSigUdfPublic(3, 128, 16)
    val sigs = docs.select(col("doc_id"), mh(col("text")).as("s"))
      .select(col("doc_id"), col("s._1").as("bh")).cache()
    val buckets = sigs.select(col("doc_id"), posexplode(col("bh")).as(Seq("band", "bsig")))
      .groupBy("band", "bsig").agg(count(lit(1)).as("n")).filter(col("n") > 1).cache()
    println("MC nontrivial buckets: " + buckets.count())
    buckets.orderBy(col("n").desc).limit(10).collect()
      .foreach(r => println(s"MC   top bucket band=${r.getInt(0)} n=${r.getLong(2)}"))
    val rawPairs = buckets.agg(sum(expr("n*(n-1)/2"))).head().getDouble(0)
    println(f"MC raw intra-bucket pairs: $rawPairs%.0f")
    val t0 = System.nanoTime()
    val c = graft.pipeline.Dedup.minhashLshPairs(docs).count()
    println(f"MC final pairs: $c (e2e ${(System.nanoTime - t0) / 1e9}%.2f s)")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Stage-by-stage wall-clock breakdown of dedup_minhash_lsh — the driver
  * bench's dominant query. Run: sbt "runMain graft.tools.ProfileMinhash".
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    println(s"docs: ${docs.count()}")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   -> $a")
      a
    }

    val mhCol = Dedup.bandBuckets(docs, 3, 128, 16)
    t("bandBuckets (sig pass)")(mhCol.count())
    t("bandBuckets again")(mhCol.count())
    t("groupBy buckets") {
      import org.apache.spark.sql.functions._
      docs.select(col("doc_id"), explode(Dedup.minhashUdfPublic(3, 128, 16)(col("text"))).as("e"))
        .select(col("e._1").as("band"), col("e._2").as("bsig"),
          concat(array(col("doc_id")), col("e._3")).as("member"))
        .groupBy(col("band"), col("bsig"))
        .agg(collect_list(col("member")).as("members"))
        .filter(size(col("members")) > 1)
        .count()
    }
    t("e2e cold")(Dedup.minhashLshPairs(docs).count())
    t("e2e warm")(Dedup.minhashLshPairs(docs).count())
    // exactness: LSH output must equal the exact n-gram Jaccard answer
    val lsh = Dedup.minhashLshPairs(docs).cache()
    val exact = Dedup.ngramJaccardPairs(docs).cache()
    val l = lsh.count(); val e = exact.count()
    val diff = lsh.except(exact).count() + exact.except(lsh).count()
    println(s"lsh=$l exact=$e symdiff=$diff ${if (diff == 0 && l == e) "MATCH" else "MISMATCH"}")
    spark.stop()
  }
}

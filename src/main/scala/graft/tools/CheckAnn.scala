package graft.tools

import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** ANN oracle groundwork: (1) dump ann_lsh output + its reconstruction SQL
  * for a DuckDB cross-check, (2) measure whether the IVF probe config
  * returns exactly the brute-force answer on each sf corpus (the
  * set-equality oracle precondition).
  */
object CheckAnn {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.mkSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
      val topk = Similarity.bruteForceTopK(emb).cache()
      val lsh = Similarity.lshTopK(emb).cache()
      val diffs = Seq(4, 6, 8, 12, 16).map { np =>
        val ivf = Similarity.ivfTopK(emb, nProbe = np)
        np -> (ivf.except(topk).count() + topk.except(ivf).count())
      }
      println(s"$sf: topk=${topk.count()} lsh=${lsh.count()} " +
        diffs.map { case (np, d) => s"ivf_symdiff(nProbe=$np)=$d" }.mkString(" "))
      lsh.coalesce(1).write.mode("overwrite").parquet(s"/tmp/ann_check/$sf/ann_lsh")
      emb.unpersist(); topk.unpersist(); lsh.unpersist()
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/ann_check/ann_lsh_oracle.sql"),
      graft.SparkEntry.oracleSql("ann_lsh"))
    spark.stop()
  }
}

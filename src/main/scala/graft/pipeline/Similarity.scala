package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Scale notes: the brute-force path is the correctness baseline — a
  * broadcast of the (small) query set against the full corpus, one pass,
  * no shuffle of the corpus side. The LSH path buckets by random
  * hyperplane signs so candidate generation touches only same-bucket
  * vectors — at 10^10 vectors the bucket join replaces the full cross
  * product; with b-bit signatures the expected bucket size is n/2^b.
  * An IVF variant would swap the signature for a k-means cell id; same
  * join shape.
  */
object Similarity {

  /** cosine(a, b) computed in double precision via codegen'd higher-order
    * functions — no UDF in the hot path.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Brute-force exact top-k cosine neighbors for the query set
    * `vec_id < numQueries`. Query side broadcast; rank window partitioned
    * by query id only (queries are few — no skew).
    */
  def bruteForceTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 3): DataFrame = {
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val scored = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(queries), col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("n_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy("vec_id", "rank")
  }

  /** Deterministic random hyperplanes (seeded) as literal arrays. */
  private def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Multi-table sign-random-projection LSH (Charikar 2002): L independent
    * tables of b-bit signatures; a vector lands in one bucket per table;
    * candidates = same-bucket in ANY table; exact cosine re-rank within
    * candidates. Recall = 1-(1-p^b)^L with p = 1-θ/π. Probabilistic →
    * exposed as a candidates+rank operator with the brute-force twin as its
    * oracle; at 10^10 vectors the (table, sig) bucket join replaces the
    * cross product (expected bucket size n/2^b per table).
    */
  def lshTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 3, bits: Int = 4,
              tables: Int = 8, dim: Int = 64, seed: Long = 42): DataFrame = {
    val planes = hyperplanes(dim, bits * tables, seed)
    def sigCol(embCol: Column, table: Int): Column =
      (0 until bits).map { b =>
        val dot = aggregate(
          zip_with(embCol, typedLit(planes(table * bits + b)), (x, p) => x.cast("double") * p),
          lit(0.0), (acc, x) => acc + x)
        when(dot >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    def bucketed(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.select(col(idCol), col(embCol),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("tbl"), sigCol(col(embCol), t).as("sig"))): _*)).as("bk"))
        .select(col(idCol), col(embCol), col("bk.tbl").as("tbl"), col("bk.sig").as("sig"))
    val corpus = bucketed(emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")), "n_id", "n_emb")
    val queries = bucketed(emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")), "q_id", "q_emb")
    val cand = corpus.join(broadcast(queries), Seq("tbl", "sig"))
      .filter(col("n_id") =!= col("q_id"))
      .select("q_id", "q_emb", "n_id", "n_emb").distinct()
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("n_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy("vec_id", "rank")
  }

  /** IVF (inverted-file) ANN: k-means cells via MLlib (seeded,
    * deterministic), queries probe their `nProbe` nearest centroids, exact
    * cosine re-rank within the probed cells. The classic
    * coarse-quantization scale path (Jégou et al., IVF in FAISS): at 10^10
    * vectors the cell assignment shards the corpus so a query touches
    * n·nProbe/k vectors; cells map to partitions (`repartition(cell)`).
    */
  def ivfTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 3,
              nCells: Int = 16, nProbe: Int = 4, seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector
    val withVec = emb.withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10).fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      .cache()
    // query → nProbe nearest centroids (driver-side: centroids are tiny)
    val centroids = model.clusterCenters.zipWithIndex
    val spark = emb.sparkSession
    val probeOf = udf { (v: Vector) =>
      centroids.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.size) { val t = c(j) - v(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }
    val queries = model.transform(withVec).filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        explode(probeOf(col("features"))).as("cell"))
    val cand = assigned.join(broadcast(queries), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .distinct()
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    val out = cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("n_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy("vec_id", "rank")
    val _ = spark
    out
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold) —
    * brute force at test scale; the LSH bucket join is the scale path.
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.95): DataFrame = {
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cos", cosine(col("a_emb"), col("b_emb")))
      .filter(col("cos") >= threshold)
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }
}

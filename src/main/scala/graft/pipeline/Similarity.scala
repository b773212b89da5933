package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Scale notes: the brute-force path is the correctness baseline — a
  * broadcast of the (small) query set against the full corpus, one pass,
  * no shuffle of the corpus side; per-side norms are computed ONCE before
  * the join (not per pair) and every dot product is the codegen'd [[VecDot]]
  * loop, so the per-pair cost is ~64 fused multiply-adds. The LSH path
  * buckets by random hyperplane signs so candidate generation touches only
  * same-bucket vectors — at 10^10 vectors the bucket join replaces the full
  * cross product; with b-bit signatures the expected bucket size is n/2^b.
  * The IVF variant swaps the signature for a k-means cell id; same join
  * shape.
  */
object Similarity {

  /** cosine(a, b) via the codegen'd [[VecDot]]; double accumulation in
    * index order (bit-identical to a per-element fold).
    */
  def cosine(a: Column, b: Column): Column =
    VecDot(a, b) / (sqrt(VecDot(a, a)) * sqrt(VecDot(b, b)))

  /** vec_id + embedding + precomputed L2 norm, under stable aliases. */
  private def withNorm(emb: DataFrame, idAs: String, embAs: String, normAs: String): DataFrame =
    emb.select(col("vec_id").as(idAs), col("embedding").as(embAs),
      sqrt(VecDot(col("embedding"), col("embedding"))).as(normAs))

  /** Brute-force exact top-k cosine neighbors for the query set
    * `vec_id < numQueries`. Query side broadcast; rank window partitioned
    * by query id only (queries are few — no skew). Norms are computed once
    * per side BEFORE the join: the per-pair expression is a single
    * codegen'd dot + one division.
    */
  def bruteForceTopK(emb: DataFrame, numQueries: Int = 20, k: Int = 3): DataFrame = {
    val queries = withNorm(emb.filter(col("vec_id") < numQueries), "q_id", "q_emb", "q_norm")
    val scored = withNorm(emb, "n_id", "n_emb", "n_norm")
      .join(broadcast(queries), col("n_id") =!= col("q_id"))
      .withColumn("cos", VecDot(col("q_emb"), col("n_emb")) / (col("q_norm") * col("n_norm")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("n_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy("vec_id", "rank")
  }

  /** Deterministic random hyperplanes (seeded) as literal arrays. Exposed
    * so the DuckDB oracle can embed the exact same doubles as SQL literals
    * and reconstruct the sign signatures + bucket join independently
    * (Double.toString round-trips, so both engines see identical planes).
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
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
        val dot = VecDot(embCol, typedLit(planes(table * bits + b)))
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
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("vec_id"), col("n_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy("vec_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold), EXACT,
    * via a blocked pair join (the sharded-flat-index shape, FAISS-style).
    *
    * Why not LSH here: at permissive thresholds (this corpus' qualifying
    * pairs sit at cos 0.45–0.51 with a dense background just below) sign-LSH
    * has p = 1-θ/π ≈ 0.65 per plane, so no (bits, tables) choice is both
    * selective and ~recall-1 — an exact low-threshold cosine join is
    * information-theoretically all-pairs. The scale lever is therefore
    * CONSTANT-FACTOR + PARALLEL SHAPE, not candidate pruning:
    *
    *  - vectors are grouped into ~`blockTarget`-row blocks; the join is
    *    B(B+1)/2 *block* pairs (tiny rows), never n²/2 row pairs — no
    *    quadratic shuffle, no per-pair array copy;
    *  - each block pair is one task computing a dense dot-product tile in a
    *    tight primitive loop (norms precomputed once per vector) and
    *    emitting only qualifying pairs;
    *  - work scales n²/2 FLOP-bound across the cluster — the same plan a
    *    10^10-vector exact pass would need (and at high thresholds callers
    *    should use [[lshTopK]]-style banding instead; see PipelineSpec's
    *    recall laws).
    */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double = 0.95,
                         blockTarget: Int = 1024): DataFrame = {
    val n = emb.count()
    val nBlocks = math.max(1L, (n + blockTarget - 1) / blockTarget).toInt
    val blocks = emb
      .select(col("vec_id"), col("embedding"),
        sqrt(VecDot(col("embedding"), col("embedding"))).as("norm"),
        pmod(col("vec_id"), lit(nBlocks)).as("blk"))
      .groupBy("blk")
      .agg(collect_list(struct(col("vec_id"), col("norm"), col("embedding"))).as("vecs"))
    val thr = threshold
    val tilePairs = udf { (xs: Seq[Row], ys: Seq[Row], same: Boolean) =>
      def conv(v: Seq[Row]): Array[(Long, Double, Array[Float])] = {
        val out = new Array[(Long, Double, Array[Float])](v.length)
        var i = 0
        v.foreach { r =>
          out(i) = (r.getLong(0), r.getDouble(1), r.getSeq[Float](2).toArray)
          i += 1
        }
        // stable tile order (collect_list order is partition-dependent)
        out.sortBy(_._1)
      }
      val a = conv(xs)
      val b = if (same) a else conv(ys)
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var i = 0
      while (i < a.length) {
        val (ida, na, va) = a(i)
        var j = if (same) i + 1 else 0
        while (j < b.length) {
          val (idb, nb, vb) = b(j)
          if (ida != idb) {
            var dot = 0.0
            var d = 0
            val dim = math.min(va.length, vb.length)
            while (d < dim) { dot += va(d).toDouble * vb(d).toDouble; d += 1 }
            if (dot / (na * nb) >= thr)
              buf += (if (ida < idb) (ida, idb) else (idb, ida))
          }
          j += 1
        }
        i += 1
      }
      buf.toSeq
    }
    val x = blocks.select(col("blk").as("x_blk"), col("vecs").as("x_vecs"))
    val y = blocks.select(col("blk").as("y_blk"), col("vecs").as("y_vecs"))
    x.join(y, col("x_blk") <= col("y_blk"))
      .select(explode(tilePairs(col("x_vecs"), col("y_vecs"), col("x_blk") === col("y_blk"))).as("p"))
      .select(col("p._1").as("a_id"), col("p._2").as("b_id"))
      .orderBy("a_id", "b_id")
  }
}

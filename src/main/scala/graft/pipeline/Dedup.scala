package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline, over
  * the `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Scale notes (100 TB / 10^10 docs):
  *  - exact: shuffle carries only (hash128, doc_id), never the text bytes;
  *    map-side partial aggregation halves the shuffle.
  *  - minhash LSH: shingle explode is the wide step — it is map-local
  *    (explode + groupBy doc_id re-aggregates within the same partitioning
  *    after one shuffle by doc_id); band buckets then join candidates only.
  *    128 permutations / 32 bands × 4 rows → recall ≈ 1-(1-j^4)^32 ≈ 1.0 at
  *    j ≥ 0.8, so the verified output equals the exact-Jaccard answer.
  *  - verification joins are broadcast when the candidate set is small; AQE
  *    re-plans when it is not.
  */
object Dedup {

  /** Exact dedup: one survivor (min doc_id) per identical text. The
    * group-by key is a 128-bit fingerprint (xxhash64 ⊕ md5 halves), so the
    * shuffle never carries document bodies — the survivor's identity is the
    * full answer at 10^10-doc scale (hash collision odds ≪ disk error odds).
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(xxhash64(col("text")).as("h64"), md5(col("text")).as("h128"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .select("keep_id", "n")
      .orderBy("keep_id")

  /** Character k-shingles of `text`, distinct per doc: (doc_id, shingle). */
  def shingles(docs: DataFrame, k: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        explode(expr(s"transform(sequence(1, length(text)-${k - 1}), i -> substring(text, i, $k))")).as("shingle"))
      .distinct()

  /** Exact n-gram Jaccard similar pairs (a < b, J ≥ threshold): the
    * ground-truth near-dup operator and the oracle for the LSH variants.
    * Self-join on shared shingles → |A∩B| counts; sizes joined in; pure
    * map-side arithmetic afterwards.
    */
  def ngramJaccardPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingles(docs, k).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.withColumnRenamed("doc_id", "a_id")
    val b = sh.withColumnRenamed("doc_id", "b_id")
    val inter = a.join(b, Seq("shingle")).filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "sza"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "szb"), "b_id")
      .filter(col("inter") >= lit(threshold) * (col("sza") + col("szb") - col("inter")))
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }

  // 2^31-1: keeps a_i·h < 2^62 so the permutation arithmetic never
  // overflows LongType under Spark 4's default ANSI mode
  private val MersennePrime = (1L << 31) - 1

  /** MinHash signatures: 128 permutations h_i(x) = (a_i·x + b_i) mod p over
    * xxhash64 shingle hashes (Broder's min-wise independent permutations;
    * seeds fixed → deterministic).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 3, numPerm: Int = 128): DataFrame = {
    val rng = new java.util.Random(42)
    val perms = Array.fill(numPerm)((math.abs(rng.nextLong()) % MersennePrime max 1L,
      math.abs(rng.nextLong()) % MersennePrime))
    val sh = shingles(docs, k)
      .withColumn("h", pmod(xxhash64(col("shingle")), lit(MersennePrime)))
    val aggs = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * lit(a) + lit(b), lit(MersennePrime))).as(s"mh$i")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash + LSH banding: candidates from band-bucket collisions, then
    * exact-Jaccard verification — output equals [[ngramJaccardPairs]] (the
    * banding only prunes the pair space; recall ≈ 1 at the threshold).
    */
  def minhashLshPairs(docs: DataFrame, k: Int = 3, threshold: Double = 0.8,
                      numPerm: Int = 128, bands: Int = 32): DataFrame = {
    val rows = numPerm / bands
    val sig = minhashSignatures(docs, k, numPerm)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"mh$i")): _*).as("sig"))
    }
    // cache: buckets feed both sides of the self-join; cand feeds both the
    // id-prune broadcast and the verify join — without caching, the whole
    // 128-perm signature pipeline would re-execute per consumer
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
      .cache()
    val cand = buckets.alias("x").join(buckets.alias("y"), Seq("band", "sig"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
      .cache()
    // adversarial-verification stage: exact Jaccard on the candidates only.
    // Per-doc SORTED shingle-hash sets ride in ONE broadcast map; each
    // candidate pair is verified by a sorted-merge intersect inside a
    // single UDF — no join, no per-row array materialization, no
    // row-explosion shuffle (a shingle-equality join would emit Σ|A∩B| ≈
    // 10^8+ rows on a similarity-saturated corpus; a broadcast-join of the
    // array columns would copy ~1 KB of set bytes into every one of the
    // 10^6-10^7 candidate rows). The size-ratio bound (J ≤ min/max) short-
    // circuits inside the same UDF. Broadcast scales to ~10^7 docs; past
    // that, verify bucket-locally with partitioned set shards.
    val setsLocal: Map[Long, Array[Long]] = shingles(docs, k)
      .withColumn("sh64", xxhash64(col("shingle")))
      .groupBy("doc_id").agg(sort_array(collect_set(col("sh64"))).as("sset"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val bcSets = docs.sparkSession.sparkContext.broadcast(setsLocal)
    val thr = threshold
    val passes = udf { (aId: Long, bId: Long) =>
      val sa = bcSets.value(aId)
      val sb = bcSets.value(bId)
      val (small, big) = if (sa.length <= sb.length) (sa, sb) else (sb, sa)
      if (small.length < thr * big.length) false
      else {
        var i = 0; var j = 0; var inter = 0
        while (i < small.length && j < big.length) {
          if (small(i) == big(j)) { inter += 1; i += 1; j += 1 }
          else if (small(i) < big(j)) i += 1
          else j += 1
        }
        inter >= thr * (sa.length + sb.length - inter)
      }
    }
    cand.filter(passes(col("a_id"), col("b_id")))
      .select("a_id", "b_id")
      .orderBy("a_id", "b_id")
  }

  /** 64-bit SimHash over word unigrams+bigrams (Charikar 2002; the Google
    * near-dup fingerprint). Computed in one pass per row by a deterministic
    * FNV-based scala function; candidate pairs via the 4-band pigeonhole
    * trick (hamming ≤ 3 ⇒ at least one identical 16-bit band), verified
    * with `bit_count` on the xor — all columnar after the UDF.
    */
  def simhash64: Column => Column = {
    val f = udf { (text: String) =>
      val votes = new Array[Int](64)
      def fnv(s: String): Long = {
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
        h
      }
      val words = text.split(' ')
      var i = 0
      while (i < words.length) {
        if (words(i).nonEmpty) {
          val h1 = fnv(words(i))
          var b = 0
          while (b < 64) { votes(b) += (if (((h1 >>> b) & 1L) == 1L) 1 else -1); b += 1 }
          if (i + 1 < words.length && words(i + 1).nonEmpty) {
            val h2 = fnv(words(i) + " " + words(i + 1))
            b = 0
            while (b < 64) { votes(b) += (if (((h2 >>> b) & 1L) == 1L) 1 else -1); b += 1 }
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    (c: Column) => f(c)
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val withSig = docs.select(col("doc_id"), simhash64(col("text")).as("sig"))
    val banded = withSig.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bits").as("bits"))
    banded.alias("x").join(banded.alias("y"), Seq("band", "bits"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a_id", "b_id")
  }
}

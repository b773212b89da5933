package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`.
  * Everything except the fingerprint is pure `functions._` — whole-stage
  * codegen end to end, no UDF in the scan path.
  */
object TextStats {

  /** Non-overlapping occurrence count of literal `pat` — the
    * length-difference trick, chosen because it is reproducible in any
    * engine (the DuckDB oracle uses the identical formula).
    */
  def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat)))) / pat.length).cast("long")

  /** Stopword-profile language ID: score per language = hits of its top
    * function words (space-delimited to avoid substring noise); prediction
    * = argmax with fixed tie order (de < en < es < fr < zh). A pragmatic
    * n-gram-free heuristic whose exact arithmetic an oracle can mirror.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " die ", " und ", " ist ", " nicht "),
    "en" -> Seq(" the ", " and ", " of ", " to ", " a "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " y "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des "),
    "zh" -> Seq("的", "是", "了", "在", "我")
  )

  def langScores(text: Column): Seq[(String, Column)] = {
    val padded = concat(lit(" "), text, lit(" "))
    langProfiles.map { case (lang, words) =>
      lang -> words.map(w => occurrences(padded, w)).reduce(_ + _)
    }
  }

  def langId(docs: DataFrame): DataFrame = {
    val scores = langScores(col("text"))
    // argmax via greatest + chained when (ties resolve in profile order)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, s)) =>
      when(acc.isNull && s === best, lit(lang)).otherwise(acc)
    }
    val outCols = Seq(col("doc_id")) ++
      scores.map { case (l, s) => s.as(s"score_$l") } :+ pred.as("pred_lang")
    docs.select(outCols: _*).orderBy("doc_id")
  }

  /** Quality-scoring signals: length, token count, mean token length,
    * punctuation count, stopword hits, plus an integer quality bucket
    * (0-3) from fixed thresholds — floats kept out of the contract.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = trim(col("text"))
    val nChars = length(t).cast("long")
    val nTokens = (nChars - length(replace(t, lit(" "))).cast("long") + 1).cast("long")
    val nPunct = (length(t) - length(translate(t, ".,;:!?'\"()", ""))).cast("long")
    val stop = occurrences(concat(lit(" "), t, lit(" ")), " the ") +
      occurrences(concat(lit(" "), t, lit(" ")), " a ") +
      occurrences(concat(lit(" "), t, lit(" ")), " of ")
    val bucket = when(nTokens < 10, 0)
      .when(nTokens < 25, 1)
      .when(stop > 0, 3)
      .otherwise(2)
    docs.select(col("doc_id"), nChars.as("n_chars_q"), nTokens.as("n_tokens"),
        nPunct.as("n_punct"), stop.as("stopword_hits"), bucket.cast("long").as("quality_bucket"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (letter runs / digit runs / single other non-space) — the standard
    * pre-tokenizer shape.
    */
  def tokenCounts(docs: DataFrame): DataFrame = {
    val t = trim(col("text"))
    val ws = (length(t) - length(replace(t, lit(" "))) + 1).cast("long")
    val bpe = size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)")).cast("long")
    docs.select(col("doc_id"), ws.as("ws_tokens"), bpe.as("bpe_tokens")).orderBy("doc_id")
  }

  /** Rolling-hash document fingerprint (Rabin-Karp over codepoints, mod
    * 2^61-1) + winnowing-lite: min hash of each 8-gram window. One pass
    * per row; deterministic. Not SQL-expressible → rows-only check.
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    val p = (1L << 31) - 1 // Mersenne prime; h*base+c stays < 2^40, no overflow
    val base = 257L
    val f = udf { (text: String) =>
      var h = 0L
      var i = 0
      while (i < text.length) {
        h = (h * base + text.charAt(i)) % p
        i += 1
      }
      h
    }
    val wmin = udf { (text: String) =>
      if (text.length < 8) 0L
      else {
        var best = Long.MaxValue
        var i = 0
        while (i + 8 <= text.length) {
          var h = 0xcbf29ce484222325L
          var j = i
          while (j < i + 8) { h ^= text.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
          if (h < best) best = h
          i += 1
        }
        best
      }
    }
    docs.select(col("doc_id"), f(col("text")).as("doc_hash"), wmin(col("text")).as("win_min"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signals (Rae et al., arXiv:2112.11446,
    * Table A1) per document: whitespace token count, distinct tokens, and
    * the occurrence count of the most frequent unigram / bigram / trigram.
    *
    * One map-only UDF pass with a per-row hash table: the grouping key
    * (doc_id) is the row itself, so exploding tokens into a shuffle to
    * compute per-doc maxima would pay an exchange for nothing — at 100 TB
    * this operator must stay narrow. Split semantics match DuckDB
    * `string_split(text, ' ')` exactly (`split(" ", -1)`: empties kept).
    */
  private def repStatsOf(text: String): RepStats = {
    val toks = if (text == null) Array.empty[String] else text.split(" ", -1)
    def topCount(n: Int): Long = {
      if (toks.length < n) 0L
      else {
        val m = new java.util.HashMap[String, java.lang.Long]()
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = i
          while (j < i + n) { sb.append(toks(j)); sb.append('\u0001'); j += 1 }
          val k = sb.toString
          val prev = m.get(k)
          m.put(k, if (prev == null) 1L else prev + 1L)
          i += 1
        }
        var best = 0L
        val it = m.values().iterator()
        while (it.hasNext) { val v = it.next(); if (v > best) best = v }
        best
      }
    }
    var distinct = 0L
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { if (seen.add(toks(i))) distinct += 1; i += 1 }
    RepStats(toks.length.toLong, distinct, topCount(1), topCount(2), topCount(3))
  }

  private val repStatsUdf = udf(repStatsOf _)

  /** Scalar twin of [[qualityFilter]]'s reason bitmask for the SQL surface
    * (`graft_quality_reasons`): identical integer arithmetic, with the
    * non-space character count done in codepoints to match SQL `length`.
    */
  def qualityReasonsValue(text: String): Long = {
    // null text matches the DataFrame twin: zero tokens -> bit 1 only
    // (the nc comparisons are null there, so no other bit can fire)
    if (text == null) return 1L
    val r = repStatsOf(text)
    var nc = 0L
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp != ' '.toInt) nc += 1
      i += Character.charCount(cp)
    }
    val nt = r.n_tokens
    (if (nt < 25) 1L else 0L) +
      (if (nc * 10 < nt * 38 || nc * 10 > nt * 46) 2L else 0L) +
      (if (r.top_unigram * 5 > nt) 4L else 0L) +
      (if (r.distinct_tokens * 3 < nt) 8L else 0L)
  }

  /** Scalar top n-gram occurrence count (`graft_rep_top`). */
  def repTopValue(text: String, n: Int): Long = {
    val r = repStatsOf(text)
    n match {
      case 1 => r.top_unigram
      case 2 => r.top_bigram
      case 3 => r.top_trigram
      case _ => 0L
    }
  }

  /** TF-IDF's integer core, per document: the highest-tf term (ties break
    * to the lexicographically smallest term — fully deterministic) with
    * its in-doc term frequency and corpus document frequency. The idf
    * logarithm is left to the caller: floats are kept out of the contract,
    * and (tf, df) is the part that needs the corpus-wide shuffle.
    * Shuffles only (doc_id, token) pairs; the window is per-doc.
    */
  def tfidfTop(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("tok").asc)
    tf.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .join(dfreq, "tok")
      .select(col("doc_id"), col("tok").as("top_term"), col("tf"), col("df"))
      .orderBy("doc_id")
  }

  def repetitionStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), repStatsUdf(col("text")).as("r"))
      .select(col("doc_id"),
        col("r.n_tokens").as("n_tokens"),
        col("r.distinct_tokens").as("distinct_tokens"),
        col("r.top_unigram").as("top_unigram"),
        col("r.top_bigram").as("top_bigram"),
        col("r.top_trigram").as("top_trigram"))
      .orderBy("doc_id")

  /** Composite Gopher/C4-style keep/drop decision with a reason bitmask.
    * Bits: 1 = too short (<25 tokens), 2 = mean word length outside
    * [3.8, 4.6] (×10 integer compare — no floats in the contract),
    * 4 = most frequent unigram covers >20 % of tokens, 8 = distinct
    * tokens under a third of tokens. `keep` = 1 iff no bit set. Pure
    * integer arithmetic so any engine reproduces the mask bit-exactly;
    * at scale the drop is applied as `filter(keep)` before any shuffle.
    */
  def qualityFilter(docs: DataFrame): DataFrame =
    qualityFlags(docs).orderBy("doc_id")

  /** The stream-safe core of [[qualityFilter]] (no output ordering): a
    * pure per-row map, so it runs identically at ingest time over a page
    * stream — filter at the lake's front door, store only keepers.
    */
  def qualityFlags(docs: DataFrame): DataFrame = {
    val nc = length(replace(col("text"), lit(" "))).cast("long")
    val withR = docs.select(col("doc_id"), repStatsUdf(col("text")).as("r"), nc.as("nc"))
    val nt = col("r.n_tokens")
    val reasons =
      when(nt < 25, 1L).otherwise(0L) +
        when(col("nc") * 10 < nt * 38 || col("nc") * 10 > nt * 46, 2L).otherwise(0L) +
        when(col("r.top_unigram") * 5 > nt, 4L).otherwise(0L) +
        when(col("r.distinct_tokens") * 3 < nt, 8L).otherwise(0L)
    withR.select(col("doc_id"), reasons.as("reasons"),
      when(reasons === 0, 1L).otherwise(0L).as("keep"))
  }
}

/** Per-document repetition signals — top level (not nested in the object)
  * so Catalyst's generated serializer can reference the accessor methods.
  */
case class RepStats(n_tokens: Long, distinct_tokens: Long,
    top_unigram: Long, top_bigram: Long, top_trigram: Long)

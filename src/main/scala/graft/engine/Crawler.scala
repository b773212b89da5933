package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession, GraftSqlBridge => B}
import org.apache.spark.sql.functions._
import graft.extract._
import graft.urls.Urls

/** The Spark-native crawl loop: the reference's fetch → extract → paginate
  * sequential browser loop (`/root/reference/svcimpl.go:166-503`)
  * re-expressed as driver-side BFS rounds over a frontier Dataset
  * (SURVEY.md §3.1 "Spark lifecycle"). Each round is one Catalyst-planned
  * job:
  *
  *   frontier batch → fetch (join against the Common-Crawl-style corpus on
  *   url; broadcast when the batch is small, SMJ + AQE at scale) →
  *   politeness schedule → CrawlExtractExpression (one parse per page) →
  *   posexplode items → successor discovery → per-seed URL-seen anti-join
  *   (bloom prefilter + cuckoo sketch at scale) → frontier := successors →
  *   snapshot commit (checkpoint/resume via FrontierStore).
  *
  * "Fetch" against a static corpus is a scan-join (SURVEY.md S1); at real
  * scale the join is replaced by an HTTP fetcher behind the same politeness
  * schedule. The loop is data-dependent (next url discovered from page N),
  * hence a driver fixpoint loop like GraphX/Pregel — not Structured
  * Streaming (SURVEY.md §2.5 streaming row).
  */
final class Crawler(
    spark: SparkSession,
    corpus: DataFrame,
    config: Crawler.Config = Crawler.Config()
) {
  import Crawler._
  import spark.implicits._

  private val corpusPages = corpus.select(col("url"), col("html"))

  /** Successor rows the sketch prefilter proved new (skipped the exact
    * anti-join shuffle) — observable pruning metric for tests/telemetry.
    */
  val prefilterSkipped: org.apache.spark.util.LongAccumulator =
    spark.sparkContext.longAccumulator("graft_prefilter_skipped")

  /** Current executor-resident URL-seen shard generation (None until the
    * sharded path activates). Test/chaos hook: unpersisting it simulates
    * executor loss of the locally-checkpointed shard blocks mid-crawl —
    * the loop must recover by rebuilding from `seen`, not fail.
    */
  @volatile private[graft] var liveShards:
      Option[org.apache.spark.rdd.RDD[(Int, (CuckooFilter, SeenShard))]] = None

  /** `Rabida.Crawl` (`svc.go:93-101`): paginated crawl over seeds sharing
    * one Job shape. Default seed list = the job's own link
    * (`svcimpl.go:256-259` StartPageUrl override included).
    */
  def crawl(job: Job, seeds: Seq[(String, String)] = Nil): DataFrame =
    run(job, seedFrame(job, seeds), scroll = false, mode = JsProperty)

  /** Priority-frontier entry: seeds arrive as a DataFrame carrying an
    * explicit `priority` column (lower crawls first) — the north-star
    * frontier-table shape, where the seed list is itself a table (e.g.
    * priorities derived from `LinkGraph.pagerank` host ranks) rather than
    * a driver-side Seq. With `Config.batchLimit` set, each round takes the
    * highest-priority slice; successors inherit `priority + 1`, so a
    * high-priority site's pagination still outranks low-priority seeds.
    */
  def crawlPrioritized(job: Job, seeds: DataFrame): DataFrame =
    run(job,
      // null-safe: the batch slice orders priority ascending (NULLS FIRST
      // in Spark), so a null priority — e.g. an un-coalesced left join —
      // would silently crawl BEFORE priority 0; send it to the back instead
      seeds.select(col("seed_id"), col("url"),
          coalesce(col("priority").cast("int"), lit(Int.MaxValue)).as("priority"))
        .withColumn("page_no", lit(1))
        .withColumn("cursor", lit(0)),
      scroll = false, mode = JsProperty)

  /** `Rabida.CrawlScroll` (`svc.go:136-144`): load-more crawl with cursor
    * dedup — only items past the cursor are extracted each round
    * (`svcimpl_scroll.go:363-376`).
    */
  def crawlScroll(job: Job, seeds: Seq[(String, String)] = Nil): DataFrame =
    run(job, seedFrame(job, seeds), scroll = true, mode = JsProperty)

  /** `Rabida.CrawlScrollSmooth` (`svc.go:171-179`): viewport-scroll crawl,
    * full re-extraction each round (no cursor; caller dedups,
    * `svcimpl_scroll_smooth.go:284-287`), DOM-attribute (not JS-property)
    * reads for generic attrs (C3, `svcimpl_scroll_smooth.go:486-492`).
    */
  def crawlScrollSmooth(job: Job, seeds: Seq[(String, String)] = Nil): DataFrame =
    run(job, seedFrame(job, seeds), scroll = false, mode = DomAttribute)

  private def seedFrame(job: Job, seeds: Seq[(String, String)]): DataFrame = {
    val effective =
      if (seeds.nonEmpty) seeds
      else {
        val link = if (job.startPageUrl.nonEmpty) job.startPageUrl else job.link
        Seq(("seed-0", link))
      }
    // big seed lists (10^6-seed rounds): toDF on a local Seq converts every
    // row to Catalyst format ON THE DRIVER (serial, and it rides the plan) —
    // parallelize instead so conversion and the downstream enrich UDFs
    // (canonicalize + hash per url) run in tasks. Small lists keep the
    // LocalRelation (broadcast-friendly, no scheduling overhead).
    val base =
      if (effective.size >= 10000)
        spark.sparkContext
          .parallelize(effective, spark.sparkContext.defaultParallelism)
          .toDF("seed_id", "url")
      // small lists: ONE partition, not leafNodeDefaultParallelism's 32 —
      // a <10^4-row frontier spread over 32 near-empty partitions makes
      // every downstream stage (seed checkpoint, broadcast build, newSeen
      // exchange) pay 32 tasks of fixed overhead for microseconds of row
      // work (guide §2.2); the enrich UDFs over <10^4 urls are a few ms
      // single-task
      else effective.toDF("seed_id", "url").coalesce(1)
    base
      .withColumn("page_no", lit(1))
      .withColumn("cursor", lit(0))
  }

  private val canonicalHash = udf((u: String) => Urls.urlHash(Urls.canonicalize(u)))
  private val hostOf = udf((u: String) => Urls.host(u))

  /** FIXTURES.md frontier schema: add (host, url_hash, host_bucket,
    * priority) to a (seed_id, url, page_no, cursor) frame — computed once
    * at insert, not per round.
    */
  private def enrich(df: DataFrame, priority: org.apache.spark.sql.Column): DataFrame = {
    val buckets = config.hostBuckets
    val bucketOf = udf((h: String) => Urls.hostBucket(h, buckets))
    df.withColumn("host", hostOf(col("url")))
      .withColumn("url_hash", canonicalHash(col("url")))
      .withColumn("host_bucket", bucketOf(col("host")))
      .withColumn("priority", priority)
  }

  /** Resolve `StartPageBtn` (L7, `svcimpl.go:348-380`): on a static corpus
    * the click becomes "read the button's href on the seed page and crawl
    * from there".
    */
  private def applyStartPageBtn(job: Job, seeds: DataFrame): DataFrame = {
    if (job.startPageBtn.css.isEmpty && job.startPageBtn.xpath.isEmpty) return seeds
    // The reference clicks the button via chromedp.BySearch, which accepts
    // BOTH css and xpath (`svcimpl.go:348-380`). Reuse the paginator's
    // click-discovery path (nextPageUrl → clickTargetHref), which dispatches
    // on selector kind and absolutizes the matched element's href.
    val q = job.startPageBtn.cssOrXpath
    val btnSel =
      if (job.startPageBtn.xpath.nonEmpty || q.startsWith("/")) Selector(xpath = q)
      else Selector(css = q, attr = job.startPageBtn.attr)
    val btnJob = Job(link = "", cssSelector = Selector(css = "graft-no-items"), paginator = btnSel)
    val x = CrawlExtractExpression(col("html"), col("url"), lit(1), lit(0), btnJob, JsProperty, scroll = false)
    // preserve any extra seed columns (crawlPrioritized's priority) so the
    // L7 rewrite composes with the priority-frontier entry
    val keep = (if (seeds.columns.contains("priority")) Seq(col("priority")) else Nil)
    val withBtn = seeds.join(corpusPages, Seq("url"), "left")
      .withColumn("x", x)
      .withColumn("btn_url", col("x.next_page_url"))
      .select(Seq(col("seed_id"),
        when(col("btn_url").isNotNull && length(col("btn_url")) > 0, col("btn_url")).otherwise(col("url")).as("url"),
        col("page_no"), col("cursor")) ++ keep: _*)
    withBtn
  }

  def run(job: Job, seeds0: DataFrame, scroll: Boolean, mode: AttrMode): DataFrame =
    run(job, seeds0, scroll, mode, None)

  /** Full loop with an optional per-round callback — the reference's
    * `callback(ret, nextPageUrl, currentPageNo) bool` abort surface
    * (`svc.go:93-101`): invoked after each round with that round's page
    * results; returning true aborts the crawl (L10). For a single-seed
    * job, rounds ≡ pages, so the cadence matches the reference exactly.
    */
  def run(job: Job, seeds0: DataFrame, scroll: Boolean, mode: AttrMode,
          callback: Option[(Int, DataFrame) => Boolean]): DataFrame = {
    val store = config.checkpointDir.map(d =>
      new FrontierStore(d, config.seenCompactEvery)(spark))
    val resumed = store.flatMap(_.loadLatest())

    def robotsFilter(df: DataFrame): DataFrame =
      if (!config.respectRobots) df
      else {
        val allowed = udf { (path: String, allows: Seq[String], disallows: Seq[String]) =>
          (allows == null && disallows == null) ||
            Robots.Rules(
              if (allows == null) Vector.empty else allows.toVector,
              if (disallows == null) Vector.empty else disallows.toVector)
              .isAllowed(path)
        }
        val pathUdf = udf { (u: String) => Robots.pathOf(u) }
        df.withColumn("__r_host", hostOf(col("url")))
          .join(robotsDim.drop("__r_delay_ms"), Seq("__r_host"), "left")
          .filter(allowed(pathUdf(col("url")), col("__r_allows"), col("__r_disallows")))
          .drop("__r_host", "__r_allows", "__r_disallows")
      }

    // robots Crawl-delay → per-host politeness gap floor, joined from the
    // executor-parsed host dimension. One tiny driver probe on the cached
    // dim decides whether any host declares a delay (so delay-free crawls
    // skip the per-round host-window shuffle entirely, as before).
    val robotsHasDelay = config.respectRobots &&
      !robotsDim.filter(col("__r_delay_ms") > 0).isEmpty
    val politenessActive = config.politeness.enabled || robotsHasDelay

    // per-round checkpoints are EAGER (lazy localCheckpoint under
    // multi-JVM local-cluster races executor block registration in the
    // post-action missing-block scan and re-runs the plan — measured 1.7×
    // slower), but checkpoint + loop-control count are fused into ONE
    // driver job via localCheckpointWithCount. Measured serial-floor
    // lever (BASELINE.md round 2: removing one per-round driver job
    // lifted 1v4 scaling 0.59→0.64).
    // RDD.doCheckpoint does NOT recurse past an action RDD that is itself
    // marked for checkpointing unless this property is set — so the shard
    // RDD's localCheckpoint mark (an ANCESTOR of every round's fused
    // frontier-checkpoint action) was never honored: it behaved as a plain
    // persist whose lineage chained across every round, and a lost block
    // would recompute through the whole multi-round merge chain. With the
    // property set, the round's one driver job also truncates the shard
    // RDD's lineage at first materialization (restored in finally below).
    val markAllKey = "spark.checkpoint.checkpointAllMarkedAncestors"
    val prevMarkAll = spark.sparkContext.getLocalProperty(markAllKey)
    spark.sparkContext.setLocalProperty(markAllKey, "true")

    var frontier: DataFrame = null
    var frontierCount = 0L
    resumed match {
      case Some(s) =>
        frontier = s.frontier
        frontierCount = frontier.count()
      case None =>
        // seed priority: an explicit column (crawlPrioritized) wins over
        // the default all-zeros (plain BFS depth ordering)
        val seedPrio: org.apache.spark.sql.Column =
          if (seeds0.columns.contains("priority")) col("priority") else lit(0)
        val (chk, n) = B.localCheckpointWithCount(
          enrich(robotsFilter(applyStartPageBtn(job, seeds0)), seedPrio))
        // the seed count is only known AFTER the checkpoint job (unlike the
        // per-round successor bound), so cap the layout post-hoc: a small
        // seed frame arriving through a many-partition plan (e.g. a parquet
        // scan-join, which bypasses seedFrame's small-list coalesce) would
        // otherwise make round 1's broadcast build and anti-joins 32-task
        // stages of near-empty overhead (guide §2.2). Narrow read of the
        // cached blocks, no extra job; the dropped partitioning claim is
        // worthless at these sizes (the batch broadcasts anyway).
        val seedParts = math.max(1L, math.min(
          spark.sparkContext.defaultParallelism.toLong,
          (n + config.frontierRowsPerPartition - 1) / config.frontierRowsPerPartition)).toInt
        frontier = if (chk.rdd.getNumPartitions > seedParts) chk.coalesce(seedParts) else chk
        frontierCount = n
    }
    // materialize the snapshot's seen union OFF the store's parquet files
    // (fused with the size count the resume needs anyway): the first
    // post-resume compaction GCs the superseded delta dirs, and a lazy
    // `seen` plan would rescan those now-deleted paths on every later
    // anti-join / sketch backfill. One O(|seen|) job, once per resume —
    // the same cost the old resume-time seen.count() already paid, and it
    // also stops every later round re-reading the whole delta chain.
    // Durability model: the checkpointed blocks are executor-resident, so
    // an executor death that takes them mid-crawl fail-stops through the
    // BlockLossUnrecoverable path below with a resume pointer — and
    // re-resume is always sound, because the store's manifest at that
    // moment lists only live dirs (compaction GC'd dirs are never in the
    // current manifest). Fail-stop + durable re-resume replaces the old
    // lazy plan's silent FileNotFound crash after compaction.
    val resumedSeen: Option[(DataFrame, Long)] =
      resumed.map(s => B.localCheckpointWithCount(s.seen))
    var seen: DataFrame = resumedSeen match {
      case Some((df, _)) => df
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("seed_id", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("url_hash", org.apache.spark.sql.types.LongType))))
    }
    var round = resumed.map(_.round).getOrElse(0)
    val perRound = scala.collection.mutable.ArrayBuffer[DataFrame]()
    // persisted-pages replay (Config.persistPages): pre-crash rounds'
    // pages reload from the store, so the resumed crawl's result equals
    // the uninterrupted crawl's — nothing extracted before the failure is
    // lost with the dead executors' cache blocks
    if (config.persistPages)
      for (st <- store; snap <- resumed; pre <- st.loadPages(snap.round))
        perRound += pre

    // async snapshot commits: round N's parquet write + manifest rename
    // overlap round N+1's compute (Spark schedules jobs from both threads
    // concurrently). Single-threaded pool → commits stay ordered, the
    // manifest ATOMIC_MOVE remains the crash-safe commit point; failures
    // surface when the futures are drained before run() returns.
    val commitPool = store.map(_ => java.util.concurrent.Executors.newSingleThreadExecutor(
      (r: Runnable) => { val t = new Thread(r, "graft-frontier-commit"); t.setDaemon(true); t }))
    val commitFutures = scala.collection.mutable.ArrayBuffer[java.util.concurrent.Future[_]]()
    def drainCommits(): Unit =
      try commitFutures.foreach(_.get()) // rethrows any commit failure
      finally {
        commitFutures.clear()
        commitPool.foreach(_.shutdown())
      }
    // fail fast each round: a snapshot commit that already failed aborts
    // the crawl now instead of after all later rounds committed newer
    // manifests (the single-threaded pool keeps commit order, so a failed
    // round-N commit means no round>N manifest has been renamed yet)
    def pollCommits(): Unit = {
      val done = commitFutures.filter(_.isDone)
      done.foreach(_.get()) // rethrows the first failure
      commitFutures --= done
    }

    // partitioned cuckoo-filter URL-seen set (north star): one filter per
    // pmod(url_hash, hostBuckets) shard. Shards are built DISTRIBUTEDLY
    // (aggregateByKey: per-partition inserts, compact blob merge) and —
    // r4 — RESIDE ON THE EXECUTORS between rounds as a hash-partitioned,
    // locally-checkpointed RDD[(shard, (cuckoo, exact))]: no driver collect, no
    // per-round shard-map broadcast, so driver memory and per-round cost
    // stay flat as the seen set grows to 10^8+ urls. Only the round's new
    // urls are merged in (narrow fullOuterJoin — both sides share the
    // shard partitioner) — except the first active round (or resume),
    // which backfills from the full seen set so the sketch can never
    // false-negative. The merge itself is LAZY: it materializes inside the
    // same job that checkpoints the round's frontier, adding zero driver
    // jobs per round.
    // r4b: each shard pairs the cuckoo SKETCH (2 B/url, cache-friendly
    // probe) with an EXACT SeenShard ((seed-hash, url-hash) pair set,
    // 16 B/url — ~160 GB fleet-wide at 10^10 urls). The exact shard
    // REPLACES the per-round residue anti-join, which had to shuffle the
    // ENTIRE cumulative seen table every round (a union tree carries no
    // stable partitioning) — the last per-round O(|seen|) term in the
    // loop. Probe order: bloom (broadcast, no shuffle) → cuckoo (fast
    // reject for definitely-new) → exact shard (authoritative), all after
    // ONE exchange by shard.
    val cuckooPartitioner = new org.apache.spark.HashPartitioner(config.hostBuckets)
    var cuckooRdd: Option[org.apache.spark.rdd.RDD[(Int, (CuckooFilter, SeenShard))]] = None
    var cuckooPrev: Option[org.apache.spark.rdd.RDD[(Int, (CuckooFilter, SeenShard))]] = None
    var cuckooPrimed = false

    // incremental broadcast bloom: rebuilding from the FULL seen set every
    // round is O(total × rounds) at 10^10 urls. Instead the filter is
    // primed once at 2× the current seen size, per-round deltas are built
    // over just the batch (round-sized, parallel) and OR-merged in, and the
    // filter re-primes from full seen only when outgrown — exponentially
    // spaced, so full scans amortize to O(total) over the whole crawl.
    var bloomFilter: Option[org.apache.spark.util.sketch.BloomFilter] = None
    var bloomCapacity = 0L
    def cuckooActive(se: Long): Boolean = se > config.cuckooThreshold
    def insertIntoCuckoo(df: DataFrame): Unit = {
      val nShards = config.hostBuckets
      val cap = config.cuckooCapacityPerShard
      def freshPair() = (CuckooFilter.create(cap), SeenShard.create())
      val delta = df
        .select(pmod(col("url_hash"), lit(nShards)).cast("int").as("shard"),
          col("seed_id"), col("url_hash"))
        .rdd.map(r => (r.getInt(0), (SeenShard.seedHash(r.getString(1)), r.getLong(2))))
        .aggregateByKey(freshPair(), cuckooPartitioner)(
          { case ((f, e), (sh, uh)) => f.insert(uh); e.insert(sh, uh); (f, e) },
          { case ((fa, ea), (fb, eb)) => (fa.merge(fb), ea.merge(eb)) })
      val merged = cuckooRdd match {
        case None => delta
        case Some(prev) =>
          // same partitioner on both sides → narrow join, shard-local
          // merge. COPY-ON-WRITE: `a` is an object served from the
          // PREVIOUS generation's cached block — merging in place would
          // mutate that block, so a task retry / speculative duplicate
          // re-executing this partition would re-apply the
          // non-idempotent merge (CuckooFilter.merge re-inserts every
          // fingerprint, inflating load toward the stash) and a
          // concurrent reader could observe a SeenShard mid-grow. Deep
          // copy before merging; `b` (the round delta) is freshly
          // aggregated per execution and safe to alias.
          prev.fullOuterJoin(delta, cuckooPartitioner).mapValues {
            case (Some(a), Some(b)) => (a._1.copy().merge(b._1), a._2.copy().merge(b._2))
            case (Some(a), None)    => a
            case (None, Some(b))    => b
            case (None, None)       => freshPair()
          }
      }
      merged.setName(s"graft-cuckoo-shards")
      // shard residency policy first (MEMORY_AND_DISK default: an outgrown
      // shard spills to executor-local disk instead of failing)...
      merged.persist(org.apache.spark.storage.StorageLevel.fromString(config.shardStorageLevel))
      // ...then truncate lineage at first materialization — honored via the
      // checkpointAllMarkedAncestors local property set in run() (without
      // it this mark is never acted on). The durable URL-seen authority
      // remains the checkpointed `seen` table — on executor loss the
      // filters rebuild from it via the same backfill path used on resume
      // (see the block-loss recovery around the round's frontier
      // checkpoint).
      merged.localCheckpoint()
      cuckooPrev = cuckooRdd
      cuckooRdd = Some(merged)
      liveShards = cuckooRdd
    }
    // probe rows map-side against the co-partitioned shards, ONE exchange
    // by shard: cuckoo first (a definitely-new verdict counts toward the
    // sketch-pruning metric, as before), then the EXACT shard decides the
    // cuckoo-maybes — so the round needs NO residue anti-join against the
    // cumulative seen table at all. Returns the surviving (not-seen) rows.
    def cuckooProbeNew(df: DataFrame): DataFrame = {
      val nShards = config.hostBuckets
      val schema = df.schema
      val hIdx = schema.fieldIndex("url_hash")
      val sIdx = schema.fieldIndex("seed_id")
      val acc = prefilterSkipped
      val shards = cuckooRdd.get
      val fresh = df.rdd
        .map(r => ((((r.getLong(hIdx) % nShards) + nShards) % nShards).toInt, r))
        .partitionBy(cuckooPartitioner)
        .zipPartitions(shards, preservesPartitioning = false) { (rows, fs) =>
          val filters = fs.toMap
          rows.flatMap { case (shard, row) =>
            filters.get(shard) match {
              case None => { acc.add(1L); Some(row) } // empty shard: new
              case Some((cuckoo, exact)) =>
                val uh = row.getLong(hIdx)
                if (!cuckoo.contains(uh)) { acc.add(1L); Some(row) }
                else if (!exact.contains(SeenShard.seedHash(row.getString(sIdx)), uh)) Some(row)
                else None // exactly seen — drop
            }
          }
        }
      spark.createDataFrame(fresh, schema)
    }

    // driver-side running size of the seen set — avoids a count() job per
    // round (successor batches are disjoint from seen by construction, so
    // the estimate is exact)
    var seenEstimate = resumedSeen.map(_._2).getOrElse(0L)
    var aborted = false

    // S6: deterministic per-url user-agent assignment from a broadcast
    // table (reference draws randomly from an embedded dataset,
    // `useragent/random.go:8-22`; seeded-by-url keeps crawls reproducible)
    val uas = UserAgents.pool
    val uaCol = element_at(typedLit(uas), (pmod(col("url_hash"), lit(uas.length)) + 1).cast("int"))

    try {
    while (round < config.maxRounds && frontierCount > 0 && !aborted) {
      round += 1
      pollCommits()
      // priority frontier: when a batch limit is set, take the highest-
      // priority slice ordered by (priority, host_bucket) — the north-star
      // frontier discipline; default is the full lockstep BFS round
      val (batch0, remainder, batchCount) = config.batchLimit match {
        case Some(n) if frontierCount > n =>
          // lazy boundary, not an eager checkpoint (same r4 serial-floor
          // lever as extraction): the fetch join's broadcast build is the
          // round's first consumer and fills the persisted RDD; the
          // remainder anti-join and the seen union then read the blocks.
          // The priority-frontier regime thus pays ONE driver job per
          // round too, not two. (seed_id, url) complete a TOTAL order —
          // the lazy boundary keeps lineage, so a lost block recomputes
          // the slice, and orderBy+limit with ties would be free to
          // return a DIFFERENT row set than the one already unioned into
          // `seen` and fetched (urls silently marked seen but never
          // crawled). With the tiebreaker, recompute reproduces the
          // identical batch.
          val b = B.lazyCache(
            frontier.orderBy(col("priority"), col("host_bucket"), col("seed_id"), col("url"))
              .limit(n.toInt))
          // the batch side's row count is DRIVER-KNOWN (= n): pick the
          // anti-join strategy deliberately (guide §3.1) — broadcast the
          // small slice instead of letting the planner default to a
          // sort-merge join (checkpointed/persisted leaves carry no size
          // stats, so without the hint nothing ever auto-broadcasts and
          // both sides pay an exchange)
          val bKeys = b.select("seed_id", "url")
          val rest = frontier.join(
            if (n <= config.broadcastJoinRows) broadcast(bKeys) else bKeys,
            Seq("seed_id", "url"), "left_anti")
          (b, rest, n)
        case _ => (frontier, spark.emptyDataFrame, frontierCount)
      }
      val batch = batch0

      // fetch = scan-join; broadcast the (small) frontier batch so the big
      // corpus never shuffles (SURVEY.md S1). At 10^10-frontier scale the
      // broadcast's DRIVER-SIDE hash build becomes the serial floor (it
      // grows with round size), so broadcastFrontier=false switches to a
      // shuffle-HASH join: with the corpus pre-partitioned by url (bucketed
      // table at real scale) the corpus never re-shuffles and the hash
      // build runs per-partition on the executors — fully parallel. AQE
      // splits skewed hosts either way.
      // robots Crawl-delay rides in per host via the dimension join (left:
      // hosts without a declared delay schedule on the engine's own knobs)
      def withRobotsDelay(df: DataFrame): DataFrame =
        if (robotsHasDelay)
          df.join(
            robotsDim.select(col("__r_host").as("host"),
              when(col("__r_delay_ms") > 0, col("__r_delay_ms")).as("__robots_delay_ms")),
            Seq("host"), "left")
        else df

      // politeness windows by host; without rebalancing, extraction would
      // inherit that partitioning and a hot (Zipf) host would serialize all
      // its parsing in one task — repartition by url hash so parse work
      // spreads evenly (SURVEY.md §7 hard part 5: salting the skew out of
      // the post-schedule stage; schedule columns are already computed).
      // realPace: honor the schedule in wall-clock (a live fetcher's
      // behavior); off by default — the sandbox corpus join needs no delay
      // emitted_ms carries the wall-clock emission offset (and keeps the
      // pacing udf alive through column pruning); 0 when pacing is virtual.
      // Layouts differ by pacing mode: VIRTUAL pacing repartitions by url
      // hash so a hot (Zipf) host's parse work spreads evenly (SURVEY.md
      // §7 hard part 5); WALL-CLOCK pacing must do the opposite — url-hash
      // spread would make every task sleep toward the hot host's late
      // schedule — so hosts are bin-packed by delay budget and each bin
      // runs its schedule in order, waits overlapped with tail-host work
      // (§7 hard part 6; see Politeness.packForPace).
      def schedulePace(df: DataFrame): DataFrame = {
        val sched = Politeness.schedule(withRobotsDelay(df), config.politeness,
          if (robotsHasDelay) Some(col("__robots_delay_ms")) else None)
        if (config.realPace && politenessActive)
          Politeness.pace(
            Politeness.packForPace(sched, spark.sparkContext.defaultParallelism),
            config.paceClock())
        else if (politenessActive)
          sched.repartition(col("url_hash")).withColumn("emitted_ms", lit(0L))
        else sched.withColumn("emitted_ms", lit(0L))
      }

      val fetchedPaced = config.fetcher match {
        case None =>
          // default fused shape (PlanSpec-pinned): fetch = corpus scan-join
          // FIRST (broadcast the small frontier batch so the big corpus
          // never shuffles, SURVEY.md S1; at 10^10-frontier scale
          // broadcastFrontier=false switches to a shuffle-HASH join whose
          // hash build runs per-partition on the executors, the corpus
          // pre-bucketed by url). A url absent from the corpus
          // (404/timeout lineage) consumes no politeness slot. AQE splits
          // skewed hosts either way.
          val joinBatch =
            if (config.broadcastFrontier) broadcast(batch) else batch.hint("shuffle_hash")
          schedulePace(joinBatch.join(corpusPages, Seq("url"), "inner"))
        case Some(f) =>
          // pluggable fetcher (SURVEY.md S1 "real scale" path): politeness
          // must gate the fetch itself — schedule + (wall-clock) pace the
          // frontier batch, THEN fetch, so a live fetcher issues each
          // request at its scheduled slot.
          f.fetch(schedulePace(batch))
      }
      val paced = fetchedPaced
        .withColumn("ua", uaCol)
        .withColumn("cookies", lit(job.enableCookies.rawCookies)) // S4 fetch metadata
        // parsed jar (lib/cookies.go parity): typed struct column, computed
        // once per job on the driver
        .withColumn("cookie_jar", typedLit(Cookies.forJob(
          if (job.startPageUrl.nonEmpty) job.startPageUrl else job.link,
          job.enableCookies.rawCookies, job.enableCookies.expires)))

      // cross-document iframe (P12 completion, `svcimpl.go:638-656`): when
      // the job scopes into an iframe and the matched element carries a src
      // with no inlined content, join the framed page in from the corpus so
      // extraction can scope against the framed document. Only iframe jobs
      // pay this join; at 10^10 scale it is the same url-keyed join shape
      // as the fetch itself (bucketed corpus, AQE-sized).
      val withFrame =
        if (job.cssSelector.iframe) {
          val sel = job.cssSelector
          val srcOf = udf { (html: Array[Byte], url: String) =>
            if (html == null) null
            else try {
              val doc = Extractor.parseDocument(html)
              Extractor.iframeFather(doc, sel) match {
                case Some(el) if !el.children.exists(_.isInstanceOf[graft.html.HElem]) =>
                  el.attr("src").filter(_.nonEmpty).map(s => Urls.resolve(url, s)).orNull
                case _ => null
              }
            } catch { case _: Exception => null }
          }
          paced.withColumn("__iframe_src", srcOf(col("html"), col("url")))
            .join(corpusPages.select(col("url").as("__iframe_src"), col("html").as("__iframe_html")),
              Seq("__iframe_src"), "left")
            .drop("__iframe_src")
        } else paced.withColumn("__iframe_html", lit(null).cast("binary"))

      val x = CrawlExtractExpression(col("html"), col("url"), col("page_no"), col("cursor"),
        job, mode, scroll, iframeHtml = col("__iframe_html"),
        timeBudgetMs = config.timeBudgetMs)
      // materialization boundary BEFORE projecting struct fields:
      // guarantees exactly ONE extraction (one HTML parse) per page —
      // projecting fields first would let CollapseProject clone the
      // expression per field. LAZY boundary, not an eager checkpoint (r4
      // serial-floor lever): the round's frontier checkpoint job below
      // reads the successor plan THROUGH this persisted RDD and fills it
      // in the same pass, so extraction + successor-gen + loop-control
      // count cost ONE driver job per round instead of two (BASELINE.md
      // round 2 measured one job fewer per round lifting 1v4 scaling
      // 0.59→0.64). B.lazyCache (not Dataset.persist — see its scaladoc
      // for the CacheManager-leak and lineage rationale) is as strong a
      // projection barrier as the checkpoint was.
      val materialized = B.lazyCache(withFrame
        .select(col("seed_id"), col("url"), col("url_hash"), col("host"), col("host_bucket"),
          col("priority"), col("page_no"), col("cursor"), col("scheduled_ms"), col("fetch_seq"),
          col("emitted_ms"), col("ua"), col("cookies"), col("cookie_jar"), x.as("x")))
      val pages = materialized
        .select(col("seed_id"), col("url"), col("url_hash"), col("host"), col("host_bucket"),
          col("priority"), col("page_no"), col("cursor"), col("scheduled_ms"), col("fetch_seq"),
          col("emitted_ms"), col("ua"), col("cookies"), col("cookie_jar"),
          col("x.items").as("items"), col("x.next_page_url").as("next_page_url"),
          col("x.n_scope").as("n_scope"), col("x.paginate_goon").as("paginate_goon"),
          col("x.error").as("error"))

      perRound += pages

      // L10 abort via callback (`svcimpl.go:402-404,487-489`)
      aborted = callback.exists(cb => cb(round, pages))

      // mark fetched urls seen (per-seed, matching per-Job independence of
      // the reference; SURVEY.md §2.5 set-ops row). Batches are disjoint
      // from prior seen (anti-joined at successor time) → plain union.
      // no checkpoint here: `batch` is already checkpointed (it IS the
      // frontier slice), so `seen` stays a shallow union tree over
      // materialized nodes — planning cost O(rounds), and one fewer
      // eager driver job per round (the per-round serial floor is the
      // scaling limiter, BASELINE.md round 2)
      val newSeen = batch.select(col("seed_id"), col("url_hash"))
      seen = seen.union(newSeen)
      seenEstimate += batchCount

      if (cuckooActive(seenEstimate)) {
        // first active round (incl. resume) backfills ALL of seen; after
        // that only the round's batch is inserted
        insertIntoCuckoo(if (cuckooPrimed) newSeen else seen)
        cuckooPrimed = true
      }

      if (seenEstimate > config.bloomThreshold) {
        if (bloomFilter.isEmpty || seenEstimate > bloomCapacity) {
          bloomCapacity = math.max(seenEstimate * 2, 1000L)
          bloomFilter = Some(seen.stat.bloomFilter("url_hash", bloomCapacity, 0.01))
        } else {
          // same capacity+fpp → bit-compatible; OR-merge the round's delta
          bloomFilter.foreach(
            _.mergeInPlace(newSeen.stat.bloomFilter("url_hash", bloomCapacity, 0.01)))
        }
      }

      // successor generation: L2 (no paginator → next empty), L3 (condition
      // goon), L10 (limit abort), self-loop guard, robots, URL-seen anti-join
      val limitOk =
        if (job.limit > 0) col("page_no") < lit(job.limit) else lit(true)
      val rawSucc = pages
        .filter(col("paginate_goon") && length(col("next_page_url")) > 0 && limitOk)
        .select(col("seed_id"),
          col("next_page_url").as("url"),
          (col("page_no") + 1).as("page_no"),
          (if (scroll) col("cursor") + col("n_scope") else lit(0)).as("cursor"),
          (col("priority") + 1).as("succ_priority"))
        .dropDuplicates("seed_id", "url")
      val succHashed = enrich(robotsFilter(rawSucc), col("succ_priority")).drop("succ_priority")

      // URL-seen dedup: the broadcast bloom (global, fixed-capacity,
      // NO shuffle) first splits off definitely-new successors; the
      // bloom-maybes then go through the executor-resident shards —
      // cuckoo sketch fast-reject, exact (seed-hash, url-hash) pair set
      // as the authority — after ONE exchange by url-hash shard. The
      // exact shards make a per-round anti-join against the cumulative
      // seen table unnecessary (that join re-shuffled ALL of seen every
      // round: a union tree carries no stable partitioning — the last
      // per-round O(|seen|) term in the loop). Below the activation
      // thresholds the plain anti-join remains (at small seen sizes it
      // is cheaper than maintaining the shard structures).
      val bloomOpt = bloomFilter.map(spark.sparkContext.broadcast(_))
      // successor dedup + frontier checkpoint as a (re)buildable plan: the
      // plan captures the CURRENT shard RDD, so the block-loss recovery
      // below can rebuild the shards from `seen` and re-plan.
      def dedupAndCheckpoint(): (DataFrame, Long) = {
        val cuckooOn = cuckooPrimed && cuckooRdd.nonEmpty
        // seen's row count is DRIVER-KNOWN (seenEstimate is exact —
        // batches are disjoint from prior seen): below the threshold,
        // broadcast the seen side of the anti-join so neither side pays
        // an exchange (guide §3.1 — checkpointed leaves have no stats,
        // so the planner can never choose this itself; the successor
        // side then stays fused with the extraction stage). Above it,
        // the previous sort-merge shape — and past cuckooThreshold the
        // executor-resident shards replace this join entirely.
        def seenSide: DataFrame =
          if (seenEstimate <= config.broadcastJoinRows) broadcast(seen) else seen
        val preFiltered =
          if (!cuckooOn) {
            val base = bloomOpt match {
              case Some(bc) =>
                val acc = prefilterSkipped
                // reject branch counts; each bloom-skipped row increments
                // the accumulator exactly once
                val rejectCounted = udf { (h: Long) =>
                  val might = bc.value.mightContain(h)
                  if (!might) acc.add(1L)
                  might
                }
                val quiet = udf((h: Long) => bc.value.mightContain(h))
                val bloomNew = succHashed.filter(!rejectCounted(col("url_hash")))
                bloomNew.unionByName(
                  succHashed.filter(quiet(col("url_hash")))
                    .join(seenSide, Seq("seed_id", "url_hash"), "left_anti"))
              case None =>
                succHashed.join(seenSide, Seq("seed_id", "url_hash"), "left_anti")
            }
            base
          } else {
            val acc = prefilterSkipped
            val (bloomNew, bloomMaybe) = bloomOpt match {
              case Some(bc) =>
                val rejectCounted = udf { (h: Long) =>
                  val might = bc.value.mightContain(h)
                  if (!might) acc.add(1L)
                  might
                }
                val quiet = udf((h: Long) => bc.value.mightContain(h))
                (succHashed.filter(!rejectCounted(col("url_hash"))),
                  succHashed.filter(quiet(col("url_hash"))))
              case None => (spark.emptyDataFrame, succHashed)
            }
            val shardNew = cuckooProbeNew(bloomMaybe)
            if (bloomNew.columns.nonEmpty) shardNew.unionByName(bloomNew) else shardNew
          }

        val succ = preFiltered.select("seed_id", "url", "page_no", "cursor",
          "host", "url_hash", "host_bucket", "priority")
        // the next frontier's row count is bounded by DRIVER-KNOWN counts
        // (successors ≤ batch — one next_page_url per page — plus the
        // remainder): cap the checkpoint's partitions so a small frontier
        // lands in few partitions instead of 32 near-empty ones every
        // downstream stage then pays for (guide §2.2); large frontiers
        // keep full parallelism and the partitioning-preserving wrap
        val remainderCount = frontierCount - batchCount
        val bound = batchCount + math.max(0L, remainderCount)
        val maxParts = math.max(1L, math.min(
          spark.sparkContext.defaultParallelism.toLong,
          (bound + config.frontierRowsPerPartition - 1) / config.frontierRowsPerPartition)).toInt
        // a successor may already be QUEUED (in the unfetched remainder)
        // even though not yet seen — anti-join against the remainder too,
        // keeping the earlier-queued row (BFS order), so no url is fetched
        // twice. checkpoint + loop-control count, one driver job
        B.localCheckpointWithCount(
          if (batchCount < frontierCount) {
            val rKeys = remainder.select("seed_id", "url_hash")
            remainder.unionByName(
              succ.join(
                if (remainderCount <= config.broadcastJoinRows) broadcast(rKeys) else rKeys,
                Seq("seed_id", "url_hash"), "left_anti"))
          } else succ,
          maxParts)
      }
      // mid-crawl SHARD-loss recovery: the shard RDD is locally
      // checkpointed (lineage truncated), so losing one of its blocks —
      // eviction, disk failure, or an executor death whose other blocks
      // survived — fails the round's job instead of recomputing. The
      // in-memory authority is the `seen` table: drop the dead shard
      // generation, rebuild the shards from `seen` via the same backfill
      // path resume uses, and re-run the round's checkpoint. SCOPE: this
      // recovers exactly the case where `seen`'s own backing blocks are
      // intact. A real executor death usually takes frontier/batch blocks
      // (also locally checkpointed) down with the shards — then the
      // rebuild fails the same way, and the sound recovery is the durable
      // store: the second-level catch drains pending snapshot commits (so
      // the on-disk manifest chain is consistent through the last
      // committed round) and fails with an actionable resume pointer
      // instead of a raw block-loss stack.
      val skippedBeforeAttempt = prefilterSkipped.value
      val (chk, n) =
        try dedupAndCheckpoint()
        catch {
          case t: Throwable if cuckooPrimed && cuckooRdd.nonEmpty && Crawler.looksLikeBlockLoss(t) =>
            cuckooRdd.foreach(_.unpersist(blocking = false))
            cuckooPrev.foreach(_.unpersist(blocking = false))
            cuckooRdd = None
            cuckooPrev = None
            // Spark applies accumulator updates from the failed attempt's
            // SUCCESSFUL tasks; the retry re-runs the whole plan, so
            // without a reset the pruning metric double-counts. KNOWN
            // NARROW RACE: a straggler task of the failed attempt whose
            // success event lands AFTER this reset still re-inflates the
            // count — bounded by one attempt's tasks, diagnostic-only (the
            // metric gates nothing), and not worth serializing the
            // DAGScheduler event loop to close.
            prefilterSkipped.reset()
            prefilterSkipped.add(skippedBeforeAttempt)
            insertIntoCuckoo(seen) // full backfill: seen already includes this round's batch
            try dedupAndCheckpoint()
            catch {
              case t2: Throwable if Crawler.looksLikeBlockLoss(t2) =>
                t2.addSuppressed(t)
                throw new Crawler.BlockLossUnrecoverable(
                  config.checkpointDir match {
                    case Some(d) =>
                      s"executor loss took the crawl's in-memory state (seen/frontier blocks), " +
                        s"not just the URL-seen shards; in-process rebuild is impossible. " +
                        s"Durable snapshots at '$d' are consistent — re-invoke crawl with the " +
                        s"same checkpointDir to resume from round ${round - 1}."
                    case None =>
                      "executor loss took the crawl's in-memory state (seen/frontier blocks), " +
                        "not just the URL-seen shards; in-process rebuild is impossible and no " +
                        "checkpointDir is configured. Set Config.checkpointDir to make " +
                        "mid-crawl executor loss resumable."
                  }, t2)
            }
        }
      frontier = chk
      frontierCount = n

      // the checkpoint job above materialized this round's shard merge
      // and probe (they feed the frontier plan) — release the superseded
      // shard generation
      cuckooPrev.foreach(_.unpersist(blocking = false))
      cuckooPrev = None

      store.foreach { st =>
        // capture this round's immutable frames/counters for the async
        // task. ONLY the round's newly-seen delta ships to the store —
        // the store appends it as a per-round delta file and unions the
        // manifest-listed deltas on resume, so commit work per round is
        // O(batch), never O(|seen|) (the r4 verdict's last per-round
        // O(|seen|) term).
        val (cRound, cFrontier, cNewSeen, cPages) = (round, frontier, newSeen, pages)
        val (cBatch, cFrontierNext, cSeenTotal) = (batchCount, frontierCount, seenEstimate)
        commitFutures += commitPool.get.submit(new Runnable {
          def run(): Unit = {
            val partMetrics = cPages.groupBy(spark_partition_id().as("p")).count()
              .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
            val fetchedCount = cPages.count()
            // pages snapshot rides the same ordered commit, BEFORE the
            // manifest rename (committed manifest => pages dir complete);
            // reads the round's already-cached lazyCache blocks
            if (config.persistPages) st.commitPages(cRound, cPages)
            st.commit(cRound, cFrontier, cNewSeen,
              Seq("pages_fetched" -> fetchedCount,
                // fetch misses (url absent from corpus ≙ 404/timeout lineage)
                "pages_missing" -> (cBatch - fetchedCount),
                "frontier_next" -> cFrontierNext,
                "seen_total" -> cSeenTotal),
              partMetrics)
          }
        })
      }
    }
    drainCommits()
    } catch {
      case t: Throwable =>
        // a round failed: still await queued commits so (a) no async write
        // races the caller's cleanup and (b) a commit failure surfaces as
        // a suppressed exception instead of vanishing
        try drainCommits()
        catch { case c: Throwable if c ne t => t.addSuppressed(c) }
        throw t
    } finally spark.sparkContext.setLocalProperty(markAllKey, prevMarkAll)

    val all = perRound.reduceOption(_ unionByName _).getOrElse(emptyPages(job))
    // item explosion: pos continues across scroll rounds via the cursor
    // (C1: `posexplode` + cursor offset ≡ the reference's nth-child rewrite)
    all.select(col("seed_id"), col("url"), col("page_no"), col("cursor"),
        col("next_page_url"), col("error"), col("scheduled_ms"), col("fetch_seq"),
        col("emitted_ms"), col("ua"), col("cookies"), col("cookie_jar"), col("host"), col("host_bucket"), col("priority"),
        posexplode_outer(col("items")).as(Seq("local_pos", "item")))
      .withColumn("pos", col("cursor") + col("local_pos"))
      .drop("local_pos")
  }

  private def emptyPages(job: Job): DataFrame = {
    import org.apache.spark.sql.types._
    val itemType = SchemaCompiler.itemType(job.cssSelector)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("seed_id", StringType), StructField("url", StringType),
        StructField("url_hash", LongType), StructField("host", StringType),
        StructField("host_bucket", IntegerType), StructField("priority", IntegerType),
        StructField("page_no", IntegerType), StructField("cursor", IntegerType),
        StructField("scheduled_ms", LongType), StructField("fetch_seq", LongType),
        StructField("emitted_ms", LongType),
        StructField("ua", StringType), StructField("cookies", StringType),
        StructField("cookie_jar", ArrayType(StructType(Seq(
          StructField("name", StringType), StructField("value", StringType),
          StructField("domain", StringType), StructField("expiresHours", IntegerType))))),
        StructField("items", ArrayType(itemType)), StructField("next_page_url", StringType),
        StructField("n_scope", IntegerType), StructField("paginate_goon", BooleanType),
        StructField("error", StringType))))
  }

  /** Host-keyed robots dimension, parsed ON THE EXECUTORS — no corpus
    * collect to the driver at any host count. EXACTLY one row per host
    * that publishes a robots.txt: (host, allows, disallows, crawl-delay
    * ms). A host serving robots.txt under several URL variants
    * (http/https, mirrored paths) must still yield one row — the filter
    * and delay joins are left joins against the frontier, so a duplicated
    * host would multiply frontier rows and fetch the same url twice. The
    * winner is deterministic: min_by robots URL (the driver-side
    * broadcast Map this replaced was last-write-wins, i.e. arbitrary).
    * Cached (tiny relative to the corpus) so the per-round filter joins
    * reuse it, and deliberately NOT broadcast-hinted: AQE broadcasts it
    * while it fits and falls back to a shuffled hash join at the
    * 10^7–10^8-host scale where a driver-built broadcast would be a
    * memory cliff.
    */
  private lazy val robotsDim: DataFrame = {
    val ua = config.robotsUserAgent
    val parse = udf { (url: String, html: Array[Byte]) =>
      val body =
        if (html == null) ""
        else new String(html, java.nio.charset.StandardCharsets.UTF_8)
      val r = Robots.parseFor(body, ua)
      (Urls.host(url), r.allows, r.disallows, r.crawlDelayMs.getOrElse(-1L))
    }
    corpus.filter(col("url").endsWith("/robots.txt"))
      .select(col("url").as("__r_url"),
        parse(col("url"), col("html").cast("binary")).as("r"))
      .groupBy(col("r._1").as("__r_host"))
      .agg(min_by(
        struct(col("r._2").as("__r_allows"), col("r._3").as("__r_disallows"),
          col("r._4").as("__r_delay_ms")),
        col("__r_url")).as("rules"))
      .select(col("__r_host"), col("rules.__r_allows").as("__r_allows"),
        col("rules.__r_disallows").as("__r_disallows"),
        col("rules.__r_delay_ms").as("__r_delay_ms"))
      .cache()
  }
}

/** S6 UA pool: a small set of current public browser UA strings (the
  * reference embeds a fake-useragent dataset, `useragent/ua.go:8-38`;
  * ours is deterministic and seeded per url).
  */
object UserAgents {

  /** `useragent.RandomMacChromeUA()` parity (`useragent/random.go`): a
    * Mac-platform Chrome UA; deterministic (seeded) here so crawls stay
    * reproducible.
    */
  def randomMacChromeUA(seed: Long = 0L): String = {
    val macChrome = pool.filter(ua =>
      ua.contains("Macintosh") && ua.contains("Chrome/") && !ua.contains("Edg/"))
    macChrome((math.abs(seed) % macChrome.length).toInt)
  }

  val pool: Array[String] = Array(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:125.0) Gecko/20100101 Firefox/125.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.4 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36 Edg/124.0.0.0"
  )
}

object Crawler {

  /** Block loss that in-process recovery cannot repair (the rebuild
    * source itself lost blocks). The durable-store commits are drained
    * before this surfaces, so when a checkpointDir is configured the
    * on-disk snapshot chain is consistent and `crawl` resumes from it.
    */
  final class BlockLossUnrecoverable(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  /** Does this failure chain look like a lost cached/checkpointed block
    * (executor death, eviction, or an unpersisted local checkpoint)?
    * Spark surfaces task failures as a SparkException whose MESSAGE embeds
    * the task's stack-trace text, so the match runs over messages, not
    * exception classes, across the (bounded) cause chain.
    */
  private[engine] def looksLikeBlockLoss(t: Throwable): Boolean = {
    var cur: Throwable = t
    var depth = 0
    while (cur != null && depth < 16) {
      val m = cur.getMessage
      if (m != null && (m.contains("Checkpoint block") ||
          m.contains("BlockNotFound") ||
          m.contains("Failed to fetch block") ||
          m.contains("Could not find block") ||
          m.contains("FetchFailed")))
        return true
      cur = cur.getCause
      depth += 1
    }
    false
  }

  final case class Config(
      politeness: Politeness.Config = Politeness.Config(),
      maxRounds: Int = 64,
      hostBuckets: Int = 64,
      // max frontier rows fetched per round; None = full BFS lockstep.
      // When set, the highest-priority (priority, host_bucket) slice goes
      // first and the remainder carries over — the 10^10-frontier regime
      // where the frontier never fits one round.
      batchLimit: Option[Long] = None,
      respectRobots: Boolean = false,
      // product token for robots.txt group selection (RFC 9309 §2.2.1);
      // "*" = generic rules only, matching the rotating per-url UA pool
      robotsUserAgent: String = "*",
      // sleep tasks to the politeness schedule in wall-clock time (live
      // fetcher behavior); tests/bench leave the schedule virtual
      realPace: Boolean = false,
      broadcastFrontier: Boolean = true,
      // bloom prefilter only pays once the exact anti-join's shuffle is the
      // bottleneck (≈10^7+ seen urls); below that the extra bloom-build
      // action + double scan per round costs more than it saves
      bloomThreshold: Long = 10000000L,
      // partitioned cuckoo URL-seen shards activate past this seen-set size
      // (north star pairs them with the bloom); capacity sizes each shard's
      // table — overflow degrades to the victim stash, never false-negates
      cuckooThreshold: Long = 10000000L,
      cuckooCapacityPerShard: Long = 1L << 18,
      // storage level for the executor-resident URL-seen shard RDD;
      // MEMORY_AND_DISK lets an outgrown shard spill to executor-local
      // disk instead of failing (see SeenShard scaladoc sizing math).
      // Tests force "DISK_ONLY" to prove the crawl survives spilled shards.
      shardStorageLevel: String = "MEMORY_AND_DISK",
      // deliberate join strategy from driver-known row counts (guide §3.1):
      // anti-join sides at or below this many rows are broadcast-hinted
      // (checkpointed/persisted leaves carry no size stats, so the planner
      // can never pick broadcast itself and defaults both sides into a
      // sort-merge exchange). ~50 B/row ⇒ the default caps the broadcast
      // near 25 MB; above it the r5 sort-merge shape is kept (and past
      // cuckooThreshold the shards replace the seen join entirely)
      broadcastJoinRows: Long = 500000L,
      // partition-cap granularity for the per-round frontier checkpoint
      // (guide §2.2 "fewer, larger map tasks"): partitions are sized to
      // hold this many frontier rows, so a 5k-url round checkpoints into
      // ONE partition while a 10^7-url round keeps every core busy
      frontierRowsPerPartition: Long = 50000L,
      // pluggable fetch stage: None = the default fused corpus scan-join
      // (fetch before schedule — a miss consumes no politeness slot);
      // Some(f) = politeness schedules + paces FIRST, then f.fetch() runs
      // behind the schedule — the live-HTTP-fetcher wiring (SURVEY.md S1)
      fetcher: Option[Fetcher] = None,
      // wall-clock source for realPace (injectable so tests can drive the
      // pacing machinery with a past epoch and sleep zero real time)
      paceClock: () => Long = () => System.currentTimeMillis(),
      checkpointDir: Option[String] = None,
      // fold the store's per-round seen-delta chain into one base dir
      // whenever it exceeds this many entries (LSM compaction; 0 = never).
      // Resume then unions <= compactEvery+1 dirs instead of O(rounds).
      seenCompactEvery: Int = 64,
      // also snapshot each round's extracted PAGES to the store
      // (data/round=N/pages) and replay pre-crash rounds' pages into a
      // resumed crawl's result — the resumed result then equals the
      // uninterrupted crawl's, so executor loss mid-crawl loses nothing
      // (frontier/seen snapshots alone recover the LOOP but not pages
      // already extracted, whose lazyCache blocks died with the fleet).
      // Off by default: live crawls typically drain pages per round via
      // the callback/sinks, and the store then only needs frontier+seen
      // (O(batch-url) commits, not O(batch-page-bytes)).
      persistPages: Boolean = false,
      // per-page extraction wall-clock budget (L12, reference's per-step
      // chromedp timeout); 0 = unbounded. A page over budget becomes an
      // error = "timeout..." row, never a stage failure.
      timeBudgetMs: Long = 0L
  ) extends Serializable
}

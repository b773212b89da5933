package graft.engine

/** Exact, executor-resident URL-seen shard: an open-addressing hash set of
  * (seed-hash, url-hash) 128-bit pairs, one shard per
  * `pmod(url_hash, hostBuckets)` partition of the seen table — the EXACT
  * companion to [[CuckooFilter]] in the north star's partitioned URL-seen
  * design. Where the cuckoo sketch answers "maybe seen" in 2 bytes/url,
  * this shard answers "seen" (up to 128-bit pair collision, P < 1e-18 at
  * 10^10 urls) in 16 bytes/url — cheap enough that a 1000-executor fleet
  * holds 10^10 urls in ~160 GB aggregate, and it removes the last
  * per-round O(|seen|) cost from the crawl loop: the residue anti-join
  * that had to shuffle the ENTIRE cumulative seen table every round
  * (union trees carry no stable partitioning) becomes a shard-local probe
  * on rows that were already headed to the shard exchange.
  *
  * Reference semantics: the per-Job visited set `rabida`'s loop keeps
  * implicitly by following each next-page link once
  * (`/root/reference/svcimpl.go:166-503`), keyed per seed like the
  * engine's (seed_id, url_hash) anti-join it replaces.
  *
  * Plain linear probing over two parallel long arrays + an occupancy
  * bitmap (pairs may take any long values, so occupancy cannot be encoded
  * in-band); grows at 70 % load. Not thread-safe — shards are owned by
  * exactly one partition of an RDD.
  *
  * Sizing `hostBuckets` (= shard count) for a target crawl: a shard of S
  * entries costs ~S/0.7 slots × 16 B ≈ 23·S bytes resident. The shard RDD
  * persists MEMORY_AND_DISK, so a shard that outgrows the executor's
  * storage memory spills to local disk and is streamed back per probe —
  * correct but slow; keep shards memory-resident by choosing
  * hostBuckets ≥ totalUrls × 23 B / perExecutorShardBudget. At 10^10 urls
  * with a 4 GiB/executor shard budget that is ≥ 64 shards (≈1.6×10^8
  * entries ≈ 3.7 GiB each) — and growth is capped at 2^30 slots
  * (~7.5×10^8 entries at 70 % load), past which insert fails loudly with
  * this guidance rather than degrading silently.
  */
final class SeenShard private (
    private var keysSeed: Array[Long],
    private var keysUrl: Array[Long],
    private var occupied: Array[Long], // bitmap, 1 bit per slot
    private var count: Int
) extends Serializable {

  import SeenShard._

  def size: Int = count

  private def capacity: Int = keysSeed.length

  @inline private def isOccupied(i: Int): Boolean =
    (occupied(i >>> 6) & (1L << (i & 63))) != 0L
  @inline private def setOccupied(i: Int): Unit =
    occupied(i >>> 6) |= (1L << (i & 63))

  @inline private def slotOf(seedH: Long, urlH: Long): Int = {
    // mix both halves of the pair; capacity is a power of two
    var h = seedH * 0x9e3779b97f4a7c15L ^ urlH
    h ^= h >>> 32
    (h & (capacity - 1)).toInt
  }

  def contains(seedH: Long, urlH: Long): Boolean = {
    var i = slotOf(seedH, urlH)
    while (isOccupied(i)) {
      if (keysSeed(i) == seedH && keysUrl(i) == urlH) return true
      i = (i + 1) & (capacity - 1)
    }
    false
  }

  /** Insert; returns true if the pair was new. */
  def insert(seedH: Long, urlH: Long): Boolean = {
    if (needsGrow(count, capacity)) grow()
    var i = slotOf(seedH, urlH)
    while (isOccupied(i)) {
      if (keysSeed(i) == seedH && keysUrl(i) == urlH) return false
      i = (i + 1) & (capacity - 1)
    }
    keysSeed(i) = seedH; keysUrl(i) = urlH; setOccupied(i)
    count += 1
    true
  }

  private def grow(): Unit = {
    if (capacity >= MaxCapacity) {
      // cannot double past the max power-of-two array size; keep absorbing
      // inserts at rising load (linear probing stays correct below full),
      // but fail LOUD before the probe loop could spin on a full table.
      // Reaching this ceiling means hostBuckets was mis-sized — see the
      // class scaladoc's shard-count math.
      if (count >= capacity - (capacity >>> 10))
        throw new IllegalStateException(
          s"SeenShard at max capacity ($MaxCapacity slots, $count entries): " +
            "raise Crawler.Config.hostBuckets so each url-hash shard holds " +
            "fewer pairs (target <= ~1e8 entries/shard; see SeenShard scaladoc)")
      return
    }
    val oldSeed = keysSeed; val oldUrl = keysUrl; val oldOcc = occupied
    val newCap = capacity << 1
    keysSeed = new Array[Long](newCap)
    keysUrl = new Array[Long](newCap)
    occupied = new Array[Long](newCap >>> 6 max 1)
    count = 0
    var i = 0
    while (i < oldSeed.length) {
      if ((oldOcc(i >>> 6) & (1L << (i & 63))) != 0L) insert(oldSeed(i), oldUrl(i))
      i += 1
    }
  }

  /** Merge the other shard's pairs into this one (in place); returns this.
    * Used by the per-round narrow fullOuterJoin merge, mirroring
    * [[CuckooFilter.merge]].
    */
  def merge(other: SeenShard): SeenShard = {
    var i = 0
    while (i < other.keysSeed.length) {
      if (other.isOccupiedAt(i)) insert(other.keysSeed(i), other.keysUrl(i))
      i += 1
    }
    this
  }

  @inline private def isOccupiedAt(i: Int): Boolean = isOccupied(i)

  /** Deep copy for copy-on-write merging: the per-round shard merge must
    * never mutate an object served from the PREVIOUS generation's cached
    * RDD block — a task retry or speculative duplicate re-executing the
    * merge partition would otherwise re-apply the (non-idempotent) merge
    * to the already-mutated shard, and a concurrent reader could observe
    * it mid-grow.
    */
  def copy(): SeenShard =
    new SeenShard(keysSeed.clone(), keysUrl.clone(), occupied.clone(), count)
}

object SeenShard {

  /** Largest power-of-two slot count a JVM long array supports here
    * (2^30 slots = 16 GiB of key arrays — far past any sane per-shard
    * budget; the crawler should raise `hostBuckets` long before this).
    */
  private[graft] val MaxCapacity: Int = 1 << 30

  /** Grow at 70% load — overflow-safe: `count * 7` overflows Int once
    * capacity reaches 2^29 (the old `count >= capacity * 7 / 10` went
    * negative and forced growth to a negative array size past ~188M
    * entries per shard, just above the 10^10-url / 64-bucket design
    * point), so compare in Long space.
    */
  private[graft] def needsGrow(count: Int, capacity: Int): Boolean =
    count.toLong * 10L >= capacity.toLong * 7L

  def create(initialCapacity: Int = 1 << 10): SeenShard = {
    var cap = Integer.highestOneBit(math.max(initialCapacity, 64))
    if (cap < initialCapacity) cap <<= 1
    new SeenShard(new Array[Long](cap), new Array[Long](cap),
      new Array[Long]((cap >>> 6) max 1), 0)
  }

  /** 64-bit FNV-1a over the seed id's UTF-8 bytes — the probe and insert
    * sides must agree on this exact function (it IS the join key).
    */
  def seedHash(seedId: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = seedId.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}

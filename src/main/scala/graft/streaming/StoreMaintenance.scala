package graft.streaming

/** The maintenance policy every self-managing at-rest store runs (r17
  * verdict #4): the streaming writers all follow the same discipline —
  *
  *  1. HEAL-FIRST adoption: recover crash-interrupted swaps, then read
  *     the store's manifest (geometry / signature params) before the
  *     first batch — never trust the configured values over the layout
  *     the files actually carry;
  *  2. per-action CADENCES: compaction / retirement / slice-folding run
  *     every N batches ([[due]]);
  *  3. an OCCUPANCY LEVER: a driver-side stored-row counter
  *     ([[OccupancyCounter]] — seeded at (re)start, grown per batch,
  *     RESEEDED after any fold that removed rows) triggers a whole-store
  *     capacity migration to the smallest power-of-two that restores
  *     rows/capacity ≤ target ([[grownCapacity]]);
  *  4. one log line per maintenance action ([[logAction]]).
  *
  * Each writer hand-wired these rules before this object existed, so
  * every new store re-derived the discipline (and could drop a piece of
  * it — the r17 verdict's reseed finding was exactly such a gap). The
  * policy owns WHEN; the stores keep owning WHAT — the fold and
  * migration functions differ per layout
  * ([[graft.operators.Dedup.rebucketSignatureIndexStore]],
  * [[graft.operators.Ann.regeometryMultiTableCorpus]],
  * [[graft.operators.Ann.rebucketBucketedCorpus]], ...).
  */
private[graft] object StoreMaintenance {
  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The cadence predicate: fire on every `every`-th batch (1-based —
    * a writer starting at batchId 0 first fires at batch every-1);
    * `every` <= 0 = never. */
  def due(every: Int, batchId: Long): Boolean =
    every > 0 && (batchId + 1) % every == 0

  /** Occupancy lever: the smallest power-of-two growth of `capacity`
    * (clamped to `maxCapacity`) that restores rows/capacity <= target.
    * None = no migration due (lever off, already at the bound, or
    * occupancy under target). Capacity is the store's bucket count —
    * nBuckets for the band-bucket signature layouts, 2^nPlanes for the
    * LSH corpora (growth by doubling keeps the log2 exact, so
    * plane-count callers recover the new plane count losslessly). */
  def grownCapacity(rows: Long, capacity: Long, maxCapacity: Long,
      target: Long): Option[Long] = {
    require(capacity >= 1L && maxCapacity >= capacity,
      s"bad capacity bounds: capacity=$capacity max=$maxCapacity")
    if (target <= 0L || capacity >= maxCapacity ||
        rows <= target * capacity) return None
    // at least one doubling: the trigger already says occupancy is over
    // target, so returning the CURRENT capacity would be a same-size
    // migration — an O(store) rewrite that buys nothing
    var c = capacity << 1
    while (c < maxCapacity && rows / c > target) c <<= 1
    Some(math.min(c, maxCapacity))
  }

  /** Driver-side stored-row counter feeding [[grownCapacity]]: seeded
    * from ONE store count at stream (re)start (only evaluated when the
    * lever is live — the count is a real cost), grown by each batch's
    * appended rows, reseeded after a retirement fold that removed rows
    * (r17 verdict #2: an append-only counter never decrements, so
    * admit/retire churn at constant live size over-migrates). */
  final class OccupancyCounter(val target: Long) {
    private var n = 0L
    def live: Boolean = target > 0L
    /** Seed (or reseed) from a store count — lazily evaluated, and only
      * when the lever is live. */
    def seed(count: => Long): Unit = n = if (live) count else 0L
    def grew(delta: Long): Unit = if (live) n += delta
    def rows: Long = n
  }

  /** Slice-count lever for `batch=`-sliced stores (r18 — the fold
    * analogue of the occupancy lever): the cadence knob folds every N
    * batches whether or not slices accumulated; this counter folds
    * when the listing cost is actually DUE — the slice count crossed
    * `maxSlices`. Seeded from one directory listing at (re)start,
    * grown per written slice (driver arithmetic — the writer knows it
    * wrote one), reset to the post-fold remainder after a fold.
    * `maxSlices` <= 0 = off. */
  final class SliceCounter(val maxSlices: Int) {
    private var n = -1
    def live: Boolean = maxSlices > 0
    /** Seed from a listing count — lazily evaluated, once, only when
      * the lever is live. */
    def seed(count: => Int): Unit = if (live && n < 0) n = count
    def wrote(): Unit = if (live) n += 1
    def due: Boolean = live && n > maxSlices
    def folded(remaining: Int): Unit = if (live) n = remaining
  }

  /** One log line per maintenance action — the audit trail a store
    * operator greps when a migration fired at 3am. */
  def logAction(store: String, batchId: Long, what: String): Unit =
    logger.info(s"[maintenance $store] batch=$batchId: $what")
}

package graft

import graft.operators.Dedup

/** CacheScope: the release side of the operators' CACHE CONTRACT.
  * Emptiness is probed on the SQL CacheManager (public isEmpty) — NOT on
  * RDD storage info, which also sees localCheckpoint RDDs from other
  * suites and the async ContextCleaner. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cacheEmpty: Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "the quick brown fox jumps over the lazy dog tonight again"),
    (3L, "a completely unrelated subject with different vocabulary"),
    (4L, "the quick brown fox jumps over the lazy dog tonight")
  ).toDF("doc_id", "text")

  test("composing two dedup operators in release scopes leaves the cache EMPTY") {
    spark.catalog.clearCache() // isolate from other suites' leftovers
    var liveDuringRun = false
    val a = CacheScope.materializeAndRelease(
      Dedup.nearDupMinhashLsh(corpus, "doc_id", "text",
        shingleWidth = 2, numHashes = 12, bands = 4, threshold = 0.5)) { df =>
      val n = df.count()
      liveDuringRun = !cacheEmpty
      n
    }
    val b = CacheScope.materializeAndRelease(
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3, threshold = 0.5)) {
      _.count()
    }
    assert(a > 0 && b > 0, s"operators must still find the planted dups ($a, $b)")
    assert(liveDuringRun, "operator pins must be live while the action runs")
    assert(cacheEmpty, "release scopes leaked cached plans")
  }

  test("nested scopes release only their own pins (shared sub-plans refcounted)") {
    spark.catalog.clearCache()
    CacheScope.materializeAndRelease(
      Dedup.nearDupSimhash(corpus, "doc_id", "text", bits = 32)) { outer =>
      outer.count()
      assert(!cacheEmpty)
      // inner scope pins the SAME token-hash sub-plan (CacheManager
      // dedups by canonical plan): its release must decrement, not evict
      CacheScope.materializeAndRelease(
        Dedup.nearDupSimhashRadius(corpus, "doc_id", "text", bits = 32, radius = 2)) {
        _.count()
      }
      assert(!cacheEmpty,
        "inner scope must release exactly its own pins, not the outer's")
    }
    assert(cacheEmpty)
  }

  test("without a scope, pin degrades to plain persist (caller releases)") {
    spark.catalog.clearCache()
    val pairs = Dedup.nearDupSimhash(corpus, "doc_id", "text", bits = 32)
    pairs.count()
    assert(!cacheEmpty, "no scope: blocks stay pinned for reuse")
    spark.catalog.clearCache()
    assert(cacheEmpty)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing.
  *
  * The reference's document identity is a SHA-256 content hash
  * (reference: main.py:282-287, key `doc:<hex>` at main.py:78). Spark's
  * built-in `sha2(col, 256)` matches DuckDB's `sha256()` byte-for-byte, so
  * identity survives the oracle compare.
  *
  * For sketching (MinHash / SimHash) we need a *numeric* hash both engines
  * compute identically. Neither Spark's `xxhash64` nor DuckDB's `hash()`
  * match each other, so we derive a 60-bit integer from the md5 hex digest
  * (md5 is identical in both): take the first 15 hex chars and parse
  * base-16. 15 hex digits = 60 bits, always non-negative in an Int64.
  *
  * DuckDB equivalent of [[hash60]]:
  *   CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
  */
object HashFunctions {

  /** Document identity: "doc:" + sha256(content) (main.py:78). */
  def docId(content: Column): Column = concat(lit("doc:"), sha2(content, 256))

  /** Portable 60-bit non-negative integer hash of a string column. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash families for MinHash
    * (h_i(s) = hash60(i || ':' || s)). */
  def hash60(s: Column, seed: Int): Column =
    hash60(concat(lit(seed.toString), lit(":"), s))

  /** MinHash affine family (classic (a·h + b) mod p construction): ONE
    * md5 per shingle, then numHashes cheap integer mixes — 12× less
    * hashing than independent seeded md5s, identical independence
    * properties for sketching. p = 2^31-1 keeps every intermediate below
    * 2^46 (exact in Int64 on any engine). */
  val MinhashP: Long = 2147483647L

  def minhashA(i: Int): Long = 2L * i + 1
  def minhashB(i: Int): Long = (i.toLong * 1013904223L) % MinhashP

  /** Base hash for the affine family. */
  def minhashBase(s: Column): Column = hash60(s) % MinhashP

  /** i-th family member over a precomputed base-hash column. */
  def minhashMix(base: Column, i: Int): Column =
    (lit(minhashA(i)) * base + lit(minhashB(i))) % MinhashP

  /** F10 (main.py:64): file-extension extraction, `os.path.splitext`
    * semantics for the common case (last dot-suffix incl. the dot; empty
    * when none). */
  def fileExt(path: Column): Column =
    regexp_extract(path, "(\\.[^./\\\\]+)$", 1)

  /** Codegen Bloom membership probe over a STRING column — see
    * [[graft.expressions.BloomMightContain]]. Identical semantics to
    * `udf(id => filter.mightContainString(id))` without the UDF's
    * codegen boundary or per-row UTF8String→String copy. */
  def bloomMightContain(
      c: Column, filter: org.apache.spark.util.sketch.BloomFilter): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.BloomMightContain(
        org.apache.spark.sql.graftbridge.Bridge.expression(c), filter))
}
